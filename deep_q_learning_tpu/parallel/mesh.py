"""Device mesh + process setup.

The reference has no distributed capability at all (SURVEY.md §2: single
process, single device).  The framework's scale axis is the environment
instance dimension: env state, replay, and episode accounting shard over a 1-D
``("env",)`` mesh; the Q-network learner is replicated and its gradients
all-reduce over ICI inside the jitted superstep (``parallel/distributed.py``).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

ENV_AXIS = "env"


def distributed_init(**kwargs) -> None:
    """Multi-host process bootstrap (``jax.distributed.initialize``).

    No-op when running single-process (the common case on one host / in
    tests); on a pod slice each host calls this before building the mesh so
    ``jax.devices()`` spans the slice."""
    if jax.process_count() > 1:
        return  # already initialized
    try:
        jax.distributed.initialize(**kwargs)
    except (ValueError, RuntimeError):
        # single-process launch without coordinator env vars: fine
        pass


def make_env_mesh(num_devices: Optional[int] = None, devices: Optional[Sequence] = None) -> Mesh:
    """1-D mesh over the env axis (defaults to every visible device)."""
    if devices is None:
        devices = jax.devices()
    if num_devices is not None:
        devices = devices[:num_devices]
    import numpy as np

    return Mesh(np.asarray(devices), (ENV_AXIS,))


def env_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis sharding for env-dimension arrays."""
    return NamedSharding(mesh, P(ENV_AXIS))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
