"""Standing TPU kernel-compile gate: artifacts/kernel_compile_matrix.json.

Round-1 VERDICT item 6: the pytest suite runs the Pallas kernels through the
interpreter on CPU, which verifies semantics but NOT Mosaic lowering (rank-1
broadcasts, relayout gaps, and block-shape rules only bite on the real
compiler).  This script compiles EVERY shipped kernel shape family — plus the
vmapped (population) variants — on the attached TPU, checks numerics against
the pure-jnp/XLA path, and microbenches kernel vs XLA per family.

Run each round on the TPU-attached machine (no other TPU job concurrent):

    python examples/kernel_compile_matrix.py

Timing methodology (CLAUDE.md): the axon tunnel is async, so each timed loop
ends with a host scalar fetch, and per-iteration time is (t_total / iters)
after a warmup call.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

ITERS = 50


def _time_loop(fn, fetch, iters=ITERS):
    fetch(fn())  # warmup (compiled already, but prime the tunnel)
    t0 = time.monotonic()
    out = None
    for _ in range(iters):
        out = fn()
    fetch(out)  # host fetch forces remote completion
    return (time.monotonic() - t0) / iters


def _sample_xla(p, key, batch_size):
    """The XLA rank-by-comparison-sum path (replay/prioritized.py:152-176),
    inlined here as the microbench comparator."""
    n, c = p.shape
    env_key, slot_key = jax.random.split(key)
    row_sums = jnp.sum(p, axis=1)
    row_cdf = jnp.cumsum(row_sums)
    total = row_cdf[-1]
    u_env = jax.random.uniform(env_key, (batch_size,)) * total
    env_idx = jnp.sum((row_cdf[None, :] < u_env[:, None]).astype(jnp.int32), axis=1)
    env_idx = jnp.minimum(env_idx, n - 1)
    rows = p[env_idx]
    row_cdfs = jnp.cumsum(rows, axis=1)
    u_slot = jax.random.uniform(slot_key, (batch_size,)) * row_cdfs[:, -1]
    slot_idx = jnp.sum((row_cdfs < u_slot[:, None]).astype(jnp.int32), axis=1)
    slot_idx = jnp.minimum(slot_idx, c - 1)
    p_sel = p[env_idx, slot_idx] / jnp.maximum(total, 1e-12)
    return env_idx, slot_idx, p_sel


def sampler_entries():
    """PER sampling kernel vs the XLA rank-by-comparison-sum path."""
    from deep_q_learning_tpu.ops.sample_kernels import prioritized_sample_pallas

    entries = []
    for n, c, b in ((128, 4096, 256), (256, 64, 512), (8, 128, 64), (16, 200, 128)):
        p = jax.random.uniform(jax.random.PRNGKey(0), (n, c)) + 0.01
        key = jax.random.PRNGKey(1)
        entry = {"kernel": "prioritized_sample", "family": {"N": n, "C": c, "B": b}}
        try:
            t0 = time.monotonic()
            kfn = jax.jit(lambda p, k: prioritized_sample_pallas(p, k, b)).lower(
                p, key
            ).compile()
            entry["compile_s"] = round(time.monotonic() - t0, 2)
            ei, si, ps = kfn(p, key)
            ei, si = np.asarray(ei), np.asarray(si)
            assert (0 <= ei).all() and (ei < n).all()
            assert (0 <= si).all() and (si < c).all()
            np.testing.assert_allclose(
                np.asarray(ps), np.asarray(p)[ei, si] / float(jnp.sum(p)), rtol=1e-5
            )
            xfn = jax.jit(lambda p, k: _sample_xla(p, k, b))
            entry["pallas_us"] = round(
                _time_loop(lambda: kfn(p, key), lambda o: int(np.asarray(o[0])[0]))
                * 1e6,
                1,
            )
            entry["xla_us"] = round(
                _time_loop(lambda: xfn(p, key), lambda o: int(np.asarray(o[0])[0]))
                * 1e6,
                1,
            )
            entry["ok"] = True
        except Exception as e:  # noqa: BLE001 — record and continue
            entry["ok"] = False
            entry["error"] = str(e)[:300]
        entries.append(entry)
        print(json.dumps(entry))

    # vmapped (population) variant: member axis -> leading grid dimension
    for k_members, n, c, b in ((8, 16, 200, 128),):
        p = jax.random.uniform(jax.random.PRNGKey(0), (k_members, n, c)) + 0.01
        keys = jax.random.split(jax.random.PRNGKey(1), k_members)
        entry = {
            "kernel": "prioritized_sample/vmap",
            "family": {"K": k_members, "N": n, "C": c, "B": b},
        }
        try:
            t0 = time.monotonic()
            vfn = jax.jit(
                jax.vmap(lambda p, k: prioritized_sample_pallas(p, k, b))
            ).lower(p, keys).compile()
            entry["compile_s"] = round(time.monotonic() - t0, 2)
            ei, si, ps = vfn(p, keys)
            assert np.asarray(ei).shape == (k_members, b)
            entry["pallas_us"] = round(
                _time_loop(lambda: vfn(p, keys), lambda o: int(np.asarray(o[0])[0, 0]))
                * 1e6,
                1,
            )
            entry["ok"] = True
        except Exception as e:  # noqa: BLE001
            entry["ok"] = False
            entry["error"] = str(e)[:300]
        entries.append(entry)
        print(json.dumps(entry))
    return entries


def td_entries():
    """Fused TD+huber loss kernel (fwd+bwd) vs the XLA loss path."""
    from deep_q_learning_tpu.algos.losses import build_loss_fn
    from deep_q_learning_tpu.models import QNetwork
    from deep_q_learning_tpu.ops.td_kernels import build_pallas_loss_fn
    from deep_q_learning_tpu.replay.nstep import LearnBatch

    entries = []

    def make_inputs(batch, obs_dim, actions, lead=()):
        net = QNetwork(num_actions=actions, hidden=(64, 64), dueling=True)
        ks = jax.random.split(jax.random.PRNGKey(0), 6)

        def one(key):
            k = jax.random.split(key, 5)
            params = net.init(k[0], jnp.zeros((1, obs_dim)))
            target = jax.tree.map(lambda x: x + 0.01, params)
            lb = LearnBatch(
                obs=jax.random.normal(k[1], (batch, obs_dim)),
                action=jax.random.randint(k[2], (batch,), 0, actions),
                reward=jax.random.normal(k[3], (batch,)),
                next_obs=jax.random.normal(k[4], (batch, obs_dim)),
                bootstrap=jnp.full((batch,), 0.97),
            )
            return params, target, lb, jnp.ones((batch,))

        if not lead:
            return net, one(ks[0])
        stacked = jax.tree.map(
            lambda *xs: jnp.stack(xs), *[one(ks[i]) for i in range(lead[0])]
        )
        return net, stacked

    for batch, obs_dim, actions in ((256, 9, 4), (64, 4, 2), (512, 6, 3)):
        net, (params, target, lb, w) = make_inputs(batch, obs_dim, actions)
        entry = {
            "kernel": "td_huber_loss",
            "family": {"B": batch, "D": obs_dim, "A": actions},
        }
        try:
            pallas_fn = build_pallas_loss_fn(net.apply, double=True, huber_delta=1.0)
            ref_fn = build_loss_fn(
                net.apply, double=True, loss="huber", huber_delta=1.0
            )
            t0 = time.monotonic()
            kfn = jax.jit(jax.value_and_grad(pallas_fn, has_aux=True)).lower(
                params, target, lb, w
            ).compile()
            entry["compile_s"] = round(time.monotonic() - t0, 2)
            xfn = jax.jit(jax.value_and_grad(ref_fn, has_aux=True))
            (lp, _), gp = kfn(params, target, lb, w)
            (lr_, _), gr = xfn(params, target, lb, w)
            np.testing.assert_allclose(float(lp), float(lr_), rtol=1e-5)
            for a, b_ in zip(jax.tree.leaves(gp), jax.tree.leaves(gr)):
                np.testing.assert_allclose(
                    np.asarray(a), np.asarray(b_), rtol=1e-4, atol=1e-5
                )
            entry["pallas_us"] = round(
                _time_loop(
                    lambda: kfn(params, target, lb, w),
                    lambda o: float(o[0][0]),
                )
                * 1e6,
                1,
            )
            entry["xla_us"] = round(
                _time_loop(
                    lambda: xfn(params, target, lb, w),
                    lambda o: float(o[0][0]),
                )
                * 1e6,
                1,
            )
            entry["ok"] = True
        except Exception as e:  # noqa: BLE001
            entry["ok"] = False
            entry["error"] = str(e)[:300]
        entries.append(entry)
        print(json.dumps(entry))

    # vmapped variant (population learner): K members, lunar_per-like shapes
    for k_members, batch, obs_dim, actions in ((8, 128, 9, 4),):
        net, (params, target, lb, w) = make_inputs(
            batch, obs_dim, actions, lead=(k_members,)
        )
        entry = {
            "kernel": "td_huber_loss/vmap",
            "family": {"K": k_members, "B": batch, "D": obs_dim, "A": actions},
        }
        try:
            pallas_fn = build_pallas_loss_fn(net.apply, double=True, huber_delta=1.0)
            t0 = time.monotonic()
            vfn = jax.jit(
                jax.vmap(jax.value_and_grad(pallas_fn, has_aux=True))
            ).lower(params, target, lb, w).compile()
            entry["compile_s"] = round(time.monotonic() - t0, 2)
            (lp, _), gp = vfn(params, target, lb, w)
            assert np.asarray(lp).shape == (k_members,)
            entry["pallas_us"] = round(
                _time_loop(
                    lambda: vfn(params, target, lb, w),
                    lambda o: float(np.asarray(o[0][0])[0]),
                )
                * 1e6,
                1,
            )
            entry["ok"] = True
        except Exception as e:  # noqa: BLE001
            entry["ok"] = False
            entry["error"] = str(e)[:300]
        entries.append(entry)
        print(json.dumps(entry))
    return entries


def main() -> None:
    backend = jax.default_backend()
    device = jax.devices()[0].device_kind
    print(f"backend: {backend} ({device})")
    report = {
        "backend": backend,
        "device": device,
        "iters": ITERS,
        "entries": sampler_entries() + td_entries(),
    }
    failures = [e for e in report["entries"] if not e["ok"]]
    report["failures"] = len(failures)
    with open("artifacts/kernel_compile_matrix.json", "w") as fh:
        json.dump(report, fh, indent=1)
    print(
        f"wrote artifacts/kernel_compile_matrix.json "
        f"({len(report['entries'])} families, {len(failures)} failures)"
    )
    if backend == "cpu":
        print("WARNING: CPU backend — interpret mode only, not a Mosaic check")
    raise SystemExit(1 if failures else 0)


if __name__ == "__main__":
    main()
