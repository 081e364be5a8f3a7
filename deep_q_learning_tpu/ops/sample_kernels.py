"""Prioritized-replay sampling as a Pallas TPU kernel.

The classic PER structure is a binary sum-tree descended leaf-ward per sample
— a pointer-chasing, gather-heavy access pattern that is exactly what the TPU
dislikes.  The TPU-native formulation keeps the same proportional
distribution but recasts the two-level categorical as dense vector/matrix
ops (SURVEY.md §7 "PER sum-tree ... with TPU-friendly memory layout"):

  level 1 (pick env rows ∝ row sums) — PLAIN XLA, outside the kernel:
      row_cdf  = cumsum(row_sums)                  # (N,)
      env_idx  = Σ_n [row_cdf_n < u·total]         # rank via comparison-sum
  level 2 — THE KERNEL (all O(B·C) work):
      rows     = onehot(env_idx) @ priorities      # (B,N)x(N,C) on the MXU
      slot_idx = prefix_rank(rows, u₂·row_total)   # blocked, no cumsum
  selected probability (importance weights) — XLA gather outside:
      p_sel    = priorities[env_idx, slot_idx] / total
  (the MXU one-hot matmul rounds at ~bf16 precision, harmless for the
  categorical draw but visible in the weights; the exact value is a trivial
  (B,)-element gather)

Split rationale (measured on the v5e Mosaic compiler): level 1 is O(B·N)
scalar-broadcast work — ``cumsum`` has no Mosaic lowering and rank-1
broadcasts against scalars / (1, N) row vectors crash the Mosaic relayout
pass ("Invalid relayout ... vector<1x128xf32>"), while XLA already compiles
them optimally.  Level 2 owns the large (B, C) arrays; inside the kernel its
prefix sums are computed BLOCKED — 128-wide chunks multiplied by a 128×128
upper-triangular ones matrix on the MXU with a per-row carry, statically
unrolled (Mosaic lowers neither ``cumsum`` nor dynamic_slice-on-values) — so
the full (B, C) cdf never materializes.

Everything is rectangular, layout-friendly, and the heavy stage is one
kernel launch — no per-sample control flow, no log-depth loops, no
scatter/gather.  Uniform draws come in as inputs (``jax.random`` outside),
keeping the kernel a pure deterministic function and identical across
interpret/compiled modes.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


_BLOCK = 128  # MXU tile edge


def _slot_kernel(
    env_idx_ref,
    u_slot_ref,
    priorities_ref,
    slot_idx_ref,
    *,
    batch_size: int,
    num_envs: int,
    capacity: int,
):
    p = priorities_ref[:]  # (N, C)
    env_idx = env_idx_ref[:]  # (B, 1) i32 column (vmap-liftable block shape)

    # ---- row gather as one-hot matmul (MXU) --------------------------------
    col_n = jax.lax.broadcasted_iota(jnp.int32, (batch_size, num_envs), 1)
    onehot_env = (col_n == env_idx).astype(jnp.float32)
    rows = jnp.dot(onehot_env, p, preferred_element_type=jnp.float32)  # (B, C)

    # ---- slots within rows: blocked prefix rank -----------------------------
    # rank = Σ_c [inclusive_prefix_sum(rows)[b, c] < draw_b]  == searchsorted.
    # 128 columns at a time: block @ upper_triangular_ones on the MXU plus a
    # per-row carry, statically unrolled.  Trailing zero padding is harmless:
    # padded cdf entries equal the row total and every draw is strictly below
    # it (u ∈ [0,1) ⇒ draw < row_total); all-zero rows yield rank 0.
    # (all row-vector intermediates stay (B, 1)-shaped: rank-1 slices of 2-D
    # vectors hit Mosaic's "Offset change" relayout gap, and 1-D operands
    # would lift to illegal blocks under vmap's grid batching rule)
    draws = u_slot_ref[:] * jnp.sum(rows, axis=1, keepdims=True)  # (B, 1)
    c_pad = ((capacity + _BLOCK - 1) // _BLOCK) * _BLOCK
    if c_pad != capacity:
        rows_p = jnp.pad(rows, ((0, 0), (0, c_pad - capacity)))
    else:
        rows_p = rows
    row_i = jax.lax.broadcasted_iota(jnp.int32, (_BLOCK, _BLOCK), 0)
    col_i = jax.lax.broadcasted_iota(jnp.int32, (_BLOCK, _BLOCK), 1)
    upper_tri = (row_i <= col_i).astype(jnp.float32)  # inclusive prefix

    count = jnp.zeros((batch_size, 1), jnp.int32)
    carry = jnp.zeros((batch_size, 1), jnp.float32)
    for k in range(c_pad // _BLOCK):
        blk = rows_p[:, k * _BLOCK : (k + 1) * _BLOCK]  # static slice
        cdf = carry + jnp.dot(
            blk, upper_tri, preferred_element_type=jnp.float32
        )  # (B, BLOCK) inclusive prefix sums
        count = count + jnp.sum(
            (cdf < draws).astype(jnp.int32), axis=1, keepdims=True
        )
        carry = cdf[:, _BLOCK - 1 : _BLOCK]  # static keepdim slice
    slot_idx_ref[:] = jnp.minimum(count, capacity - 1)


def prioritized_sample_pallas(
    priorities: jax.Array,  # (N, C) f32, zero outside filled region
    key: jax.Array,  # PRNG key
    batch_size: int,
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Returns ``(env_idx, slot_idx, p_selected)`` with p normalized by the
    total mass — a drop-in for the jnp two-level sampler's index stage."""
    n, c = priorities.shape
    env_key, slot_key = jax.random.split(key)

    # level 1 in XLA (tiny; see module docstring for the split rationale)
    row_sums = jnp.sum(priorities, axis=1)  # (N,)
    row_cdf = jnp.cumsum(row_sums)
    total = row_cdf[n - 1]
    u_env = jax.random.uniform(env_key, (batch_size,), jnp.float32) * total
    below = row_cdf[None, :] < u_env[:, None]  # (B, N)
    env_idx = jnp.minimum(
        jnp.sum(below.astype(jnp.int32), axis=1), n - 1
    ).astype(jnp.int32)

    u_slot = jax.random.uniform(slot_key, (batch_size,), jnp.float32)
    kernel = functools.partial(
        _slot_kernel, batch_size=batch_size, num_envs=n, capacity=c
    )
    slot_idx = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((batch_size, 1), jnp.int32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),  # env_idx (B, 1)
            pl.BlockSpec(memory_space=pltpu.VMEM),  # u_slot (B, 1)
            pl.BlockSpec(memory_space=pltpu.VMEM),  # priorities (N, C)
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(env_idx.reshape(batch_size, 1), u_slot.reshape(batch_size, 1), priorities)
    slot_idx = slot_idx[:, 0]
    # exact selected probability: XLA gather (see module docstring)
    p_sel = priorities[env_idx, slot_idx] / jnp.maximum(total, 1e-12)
    return env_idx, slot_idx, p_sel
