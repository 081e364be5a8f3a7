"""Microbench: replay ring-buffer WRITE layouts on the TPU.

The cartpole headline profile (artifacts/cartpole_profile.json) attributes
~78% of the 131072-env frame to the replay add + sampling path while moving
only ~2.9 GB/s — two orders of magnitude under v5e HBM bandwidth.  The write
is `dynamic_update_slice_in_dim(buf, item[:, None], cursor, axis=1)` on
leaves laid out (num_envs, capacity, feat): the minormost dims (capacity,
feat) are small, so the update slices across the tiled minor dims at a
dynamic offset every frame.

This probe times one superstep-shaped loop (scan of STEPS writes, donated
carry) for candidate layouts:

  A. current   : (N, C, F), DUS axis 1 at dynamic cursor
  B. slot-major: (C, N, F), DUS axis 0 at dynamic cursor  (write is one
                 contiguous (1, N, F) block; minor dims (N, F))
  C. slot-major transposed: (C, F, N), DUS axis 0, item transposed (F, N)
                 (lanes = N: full 128-lane tiles)
  D. scalar leaf (N, C) vs (C, N) — the action/reward/flag pattern

plus the sample-time gather for layouts A and B at batch 512.

Run on the real chip: `python examples/replay_layout_probe.py`
"""
from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp

N = 131072
C = 64
F = 4
STEPS = 64  # writes per timed call (superstep-like scan)
B = 512  # sample batch


def timed(fn, *args, reps=5):
    out = fn(*args)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        # host fetch of a scalar forces real completion on the axon tunnel
        float(jax.tree.leaves(out)[0].ravel()[0])
        best = min(best, time.perf_counter() - t0)
    return best / STEPS * 1e6  # us per write


def loop_write(update):
    """Return a jitted fn that scans STEPS writes with a moving cursor."""

    def body(carry, i):
        buf, cur = carry
        item = jnp.full((N, F), i, jnp.float32)
        buf = update(buf, item, cur)
        return (buf, (cur + 1) % C), ()

    @jax.jit
    def run(buf):
        (buf, _), _ = jax.lax.scan(body, (buf, jnp.int32(0)), jnp.arange(STEPS, dtype=jnp.float32))
        return buf

    return run


def loop_write_scalar(update):
    def body(carry, i):
        buf, cur = carry
        item = jnp.full((N,), i, jnp.float32)
        buf = update(buf, item, cur)
        return (buf, (cur + 1) % C), ()

    @jax.jit
    def run(buf):
        (buf, _), _ = jax.lax.scan(body, (buf, jnp.int32(0)), jnp.arange(STEPS, dtype=jnp.float32))
        return buf

    return run


def main():
    results = {}

    # A. current layout (N, C, F), DUS axis 1
    a = loop_write(
        lambda buf, item, cur: jax.lax.dynamic_update_slice_in_dim(
            buf, item[:, None], cur, axis=1
        )
    )
    results["A_ncf_axis1_us"] = timed(a, jnp.zeros((N, C, F), jnp.float32))

    # B. slot-major (C, N, F), DUS axis 0
    b = loop_write(
        lambda buf, item, cur: jax.lax.dynamic_update_slice_in_dim(
            buf, item[None], cur, axis=0
        )
    )
    results["B_cnf_axis0_us"] = timed(b, jnp.zeros((C, N, F), jnp.float32))

    # C. slot-major transposed (C, F, N)
    c = loop_write(
        lambda buf, item, cur: jax.lax.dynamic_update_slice_in_dim(
            buf, item.T[None], cur, axis=0
        )
    )
    results["C_cfn_axis0_us"] = timed(c, jnp.zeros((C, F, N), jnp.float32))

    # D. scalar leaves
    d1 = loop_write_scalar(
        lambda buf, item, cur: jax.lax.dynamic_update_slice_in_dim(
            buf, item[:, None], cur, axis=1
        )
    )
    results["D_scalar_nc_axis1_us"] = timed(d1, jnp.zeros((N, C), jnp.float32))
    d2 = loop_write_scalar(
        lambda buf, item, cur: jax.lax.dynamic_update_slice_in_dim(
            buf, item[None], cur, axis=0
        )
    )
    results["D_scalar_cn_axis0_us"] = timed(d2, jnp.zeros((N, C), jnp.float32).T.copy())

    # one-hot write alternative for A: buf*(1-m) + item*m over capacity axis
    def onehot_update(buf, item, cur):
        m = (jnp.arange(C) == cur).astype(buf.dtype)  # (C,)
        return buf * (1.0 - m[None, :, None]) + item[:, None, :] * m[None, :, None]

    e = loop_write(onehot_update)
    results["E_ncf_onehot_us"] = timed(e, jnp.zeros((N, C, F), jnp.float32))

    # sample-time gather comparison (B draws, n_step window of 3)
    key = jax.random.PRNGKey(0)
    env_idx = jax.random.randint(key, (B, 3), 0, N)
    slot_idx = jax.random.randint(key, (B, 3), 0, C)

    bufA = jnp.zeros((N, C), jnp.float32)
    bufB = jnp.zeros((C, N), jnp.float32)

    @jax.jit
    def gatherA(buf):
        return buf[env_idx, slot_idx].sum()

    @jax.jit
    def gatherB(buf):
        return buf[slot_idx, env_idx].sum()

    for name, fn, buf in (("gather_A_nc", gatherA, bufA), ("gather_B_cn", gatherB, bufB)):
        fn(buf).block_until_ready()
        best = float("inf")
        for _ in range(5):
            t0 = time.perf_counter()
            float(fn(buf))
            best = min(best, time.perf_counter() - t0)
        results[name + "_us"] = best * 1e6

    results["shapes"] = {"N": N, "C": C, "F": F, "steps": STEPS, "batch": B}
    results["backend"] = jax.default_backend()
    print(json.dumps(results, indent=1, default=float))


if __name__ == "__main__":
    main()
