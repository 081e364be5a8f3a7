"""Prioritized-replay sampling as a Pallas TPU kernel.

The classic PER structure is a binary sum-tree descended leaf-ward per sample
— a pointer-chasing, gather-heavy access pattern that is exactly what the TPU
dislikes.  The TPU-native formulation keeps the same proportional
distribution but recasts BOTH levels of the two-level categorical as dense
vector/matrix ops (SURVEY.md §7 "PER sum-tree ... with TPU-friendly memory
layout"):

  level 1 (pick env rows ∝ row sums):
      row_cdf  = cumsum(row_sums)                  # (N,)
      env_idx  = Σ_n [row_cdf_n < u·total]         # rank via comparison-sum
  row gather WITHOUT a gather:
      rows     = onehot(env_idx) @ priorities      # (B,N)x(N,C) on the MXU
  level 2 (pick slots within rows):
      row_cdf2 = cumsum(rows, axis=1)              # (B, C)
      slot_idx = Σ_c [row_cdf2 < u₂·row_total]
  selected probability (for importance weights), again matmul-shaped:
      p_sel    = Σ_c rows · onehot(slot_idx)

Everything is rectangular, layout-friendly, and runs in one kernel launch —
no per-sample control flow, no log-depth loops, no scatter/gather.  Uniform
draws come in as an input (``jax.random`` outside the kernel), keeping the
kernel a pure deterministic function and identical across interpret/compiled
modes.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _sample_kernel(
    u_ref,
    priorities_ref,
    env_idx_ref,
    slot_idx_ref,
    p_sel_ref,
    *,
    batch_size: int,
    num_envs: int,
    capacity: int,
):
    p = priorities_ref[:]  # (N, C)

    # ---- level 1: env rows ∝ row sums --------------------------------------
    row_sums = jnp.sum(p, axis=1)  # (N,)
    row_cdf = jnp.cumsum(row_sums)  # (N,)
    total = row_cdf[num_envs - 1]

    u = u_ref[:]  # (2, B) uniforms in [0, 1)
    u_env = u[0] * total  # (B,)
    u_slot = u[1]  # (B,) scaled later per-row

    # rank = number of cdf entries strictly below the draw  == searchsorted
    below_env = row_cdf[None, :] < u_env[:, None]  # (B, N)
    env_idx = jnp.sum(below_env.astype(jnp.int32), axis=1)
    env_idx = jnp.minimum(env_idx, num_envs - 1)
    env_idx_ref[:] = env_idx

    # ---- row gather as one-hot matmul (MXU) ---------------------------------
    col_n = jax.lax.broadcasted_iota(jnp.int32, (batch_size, num_envs), 1)
    onehot_env = (col_n == env_idx[:, None]).astype(jnp.float32)
    rows = jnp.dot(onehot_env, p, preferred_element_type=jnp.float32)  # (B, C)

    # ---- level 2: slots within rows ----------------------------------------
    row_cdf2 = jnp.cumsum(rows, axis=1)  # (B, C)
    row_tot = row_cdf2[:, capacity - 1]
    draws = u_slot * row_tot  # (B,)
    below_slot = row_cdf2 < draws[:, None]  # (B, C)
    slot_idx = jnp.sum(below_slot.astype(jnp.int32), axis=1)
    slot_idx = jnp.minimum(slot_idx, capacity - 1)
    slot_idx_ref[:] = slot_idx

    # ---- selected probability mass (for importance weights) ----------------
    col_c = jax.lax.broadcasted_iota(jnp.int32, (batch_size, capacity), 1)
    onehot_slot = (col_c == slot_idx[:, None]).astype(jnp.float32)
    p_sel_ref[:] = jnp.sum(rows * onehot_slot, axis=1) / jnp.maximum(total, 1e-12)


def prioritized_sample_pallas(
    priorities: jax.Array,  # (N, C) f32, zero outside filled region
    key: jax.Array,  # PRNG key
    batch_size: int,
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Returns ``(env_idx, slot_idx, p_selected)`` with p normalized by the
    total mass — a drop-in for the jnp two-level sampler's index stage."""
    n, c = priorities.shape
    u = jax.random.uniform(key, (2, batch_size), jnp.float32)
    kernel = functools.partial(
        _sample_kernel, batch_size=batch_size, num_envs=n, capacity=c
    )
    return pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((batch_size,), jnp.int32),
            jax.ShapeDtypeStruct((batch_size,), jnp.int32),
            jax.ShapeDtypeStruct((batch_size,), jnp.float32),
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),  # uniforms (2, B)
            pl.BlockSpec(memory_space=pltpu.VMEM),  # priorities
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(u, priorities)
