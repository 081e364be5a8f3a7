"""Checkpoint / resume.

The reference pickles ``(params, opt_state)`` every ``back_up_frequency``
episodes (``/root/reference/General/Base/utils.py:21-40``) and has **no
mid-training resume** — buffer, ε, and counters are lost on crash
(SURVEY.md §5.3-5.4).  Here the FULL runner state (params, target params,
optimizer state, env states, replay buffer contents, RNG, every counter) is
one pytree, checkpointed with Orbax and restored exactly — training resumes
bit-identically.

A pickle-compat layer reproduces the reference's on-disk format
(``<dir>/params.pickle`` + ``<dir>/opt_state.pickle``) for users migrating
from it.
"""

from __future__ import annotations

import os
import pickle
from typing import Any

import jax
import numpy as np


# ---------------------------------------------------------------------------
# Full-state checkpoints (orbax)
# ---------------------------------------------------------------------------

def save_checkpoint(path: str, state: Any, step: int) -> str:
    """Save a pytree checkpoint under ``path/<step>``; returns the dir."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    os.makedirs(path, exist_ok=True)
    ckpt_dir = os.path.join(path, str(step))
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(ckpt_dir, state, force=True)
    return ckpt_dir


def restore_checkpoint(path: str, target: Any, step: int | None = None) -> Any:
    """Restore from ``path/<step>`` (or the latest step dir if None) into the
    structure of ``target`` (an example pytree, e.g. a fresh runner state)."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    if step is None:
        steps = sorted(int(d) for d in os.listdir(path) if d.isdigit())
        if not steps:
            raise FileNotFoundError(f"no checkpoints under {path}")
        step = steps[-1]
    with ocp.StandardCheckpointer() as ckptr:
        abstract = jax.tree.map(ocp.utils.to_shape_dtype_struct, target)
        return ckptr.restore(os.path.join(path, str(step)), abstract)


def latest_step(path: str) -> int | None:
    if not os.path.isdir(path):
        return None
    steps = sorted(int(d) for d in os.listdir(path) if d.isdigit())
    return steps[-1] if steps else None


# ---------------------------------------------------------------------------
# Reference pickle-format compatibility (utils.py:21-40)
# ---------------------------------------------------------------------------

def save_params_pickle(directory: str, params: Any, opt_state: Any) -> None:
    """Write ``params.pickle`` / ``opt_state.pickle`` exactly like the
    reference's ``generate_saving`` closure (utils.py:21-29), with device
    arrays materialized to numpy for portability."""
    os.makedirs(directory, exist_ok=True)
    host = lambda tree: jax.tree.map(np.asarray, tree)
    with open(os.path.join(directory, "params.pickle"), "wb") as f:
        pickle.dump(host(params), f)
    with open(os.path.join(directory, "opt_state.pickle"), "wb") as f:
        pickle.dump(host(opt_state), f)


def load_params_pickle(directory: str):
    """Read the reference's pickle pair (utils.py:32-40)."""
    with open(os.path.join(directory, "params.pickle"), "rb") as f:
        params = pickle.load(f)
    with open(os.path.join(directory, "opt_state.pickle"), "rb") as f:
        opt_state = pickle.load(f)
    return params, opt_state
