"""Compile-check every shipped Pallas kernel shape family on the REAL TPU.

The pytest suite runs the kernels through the Pallas interpreter on CPU
(tests/conftest.py forces the CPU backend), which verifies semantics but NOT
Mosaic lowering: `cumsum`, `dynamic_slice`-on-values, and rank-1 scalar
broadcasts all pass interpret mode and then fail or crash the real TPU
compiler (CLAUDE.md gotchas).  Run this on a TPU-attached machine after any
kernel change:

    python examples/tpu_kernel_check.py

Exit code 0 = every kernel + shape family compiles with Mosaic, executes,
and matches the pure-jnp reference numerics.
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np


def check_sampler() -> int:
    from deep_q_learning_tpu.ops.sample_kernels import prioritized_sample_pallas

    failures = 0
    # (num_envs, capacity_per_env, batch) families shipped in presets/tests:
    # lunar_per (128, 4096), small PER configs, non-128-aligned capacity
    for n, c, b in ((128, 4096, 256), (256, 64, 512), (8, 128, 64), (16, 200, 128)):
        p = jax.random.uniform(jax.random.PRNGKey(0), (n, c)) + 0.01
        key = jax.random.PRNGKey(1)
        try:
            env_idx, slot_idx, p_sel = jax.jit(
                lambda p, k: prioritized_sample_pallas(p, k, b)
            )(p, key)
            ei, si = np.asarray(env_idx), np.asarray(slot_idx)
            assert (0 <= ei).all() and (ei < n).all()
            assert (0 <= si).all() and (si < c).all()
            # p_sel must equal the normalized priority at the sampled cell
            expect = np.asarray(p)[ei, si] / float(jnp.sum(p))
            np.testing.assert_allclose(np.asarray(p_sel), expect, rtol=1e-5)
            print(f"sampler N={n} C={c} B={b}: OK")
        except Exception as e:  # noqa: BLE001 - report and continue
            failures += 1
            print(f"sampler N={n} C={c} B={b}: FAILED {str(e)[:200]}")
    return failures


def check_td_loss() -> int:
    from deep_q_learning_tpu.algos.losses import build_loss_fn
    from deep_q_learning_tpu.ops.td_kernels import build_pallas_loss_fn
    from deep_q_learning_tpu.models import QNetwork
    from deep_q_learning_tpu.replay.nstep import LearnBatch

    failures = 0
    for batch, obs_dim, actions in ((256, 9, 4), (64, 4, 2), (512, 6, 3)):
        net = QNetwork(num_actions=actions, hidden=(64, 64), dueling=True)
        obs = jax.random.normal(jax.random.PRNGKey(0), (batch, obs_dim))
        params = net.init(jax.random.PRNGKey(1), obs[:1])
        target = jax.tree.map(lambda x: x + 0.01, params)
        lb = LearnBatch(
            obs=obs,
            action=jax.random.randint(jax.random.PRNGKey(2), (batch,), 0, actions),
            reward=jax.random.normal(jax.random.PRNGKey(3), (batch,)),
            next_obs=jax.random.normal(jax.random.PRNGKey(4), (batch, obs_dim)),
            bootstrap=jnp.full((batch,), 0.97),
        )
        w = jnp.ones((batch,))
        try:
            pallas_fn = build_pallas_loss_fn(net.apply, double=True, huber_delta=1.0)
            ref_fn = build_loss_fn(net.apply, double=True, loss="huber", huber_delta=1.0)
            (lp, tdp), gp = jax.jit(jax.value_and_grad(pallas_fn, has_aux=True))(
                params, target, lb, w
            )
            (lr_, tdr), gr = jax.jit(jax.value_and_grad(ref_fn, has_aux=True))(
                params, target, lb, w
            )
            np.testing.assert_allclose(float(lp), float(lr_), rtol=1e-5)
            np.testing.assert_allclose(
                np.asarray(tdp), np.asarray(tdr), rtol=1e-4, atol=1e-5
            )
            for a, b_ in zip(jax.tree.leaves(gp), jax.tree.leaves(gr)):
                np.testing.assert_allclose(
                    np.asarray(a), np.asarray(b_), rtol=1e-4, atol=1e-5
                )
            print(f"td-loss B={batch} D={obs_dim} A={actions}: OK (loss {float(lp):.4f})")
        except Exception as e:  # noqa: BLE001
            failures += 1
            print(f"td-loss B={batch} D={obs_dim} A={actions}: FAILED {str(e)[:200]}")
    return failures


def main() -> None:
    backend = jax.default_backend()
    print(f"backend: {backend} ({jax.devices()[0].device_kind})")
    if backend == "cpu":
        print("WARNING: CPU backend — this only exercises interpret mode; "
              "run on a TPU-attached machine for a real Mosaic check.")
    failures = check_sampler() + check_td_loss()
    if failures:
        print(f"{failures} kernel check(s) FAILED")
        sys.exit(1)
    print("all kernel shape families compile and match reference numerics")


if __name__ == "__main__":
    main()
