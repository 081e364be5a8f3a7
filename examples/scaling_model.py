"""Predictive multi-chip scaling model (VERDICT r4 weak #5 / item 7).

The framework's parallelism is data-parallel over the env axis with a
replicated learner: the ONLY inter-chip traffic is the gradient pmean
(plus one scalar-metrics psum, negligible).  With per-shard env count held
fixed (weak scaling), per-superstep compute time stays constant and the
communication volume is exactly

    bytes_allreduced_per_superstep = grad_bytes * updates_per_superstep
    updates_per_superstep          = steps_per_superstep / train_every
    t_comm(N)  = updates * (2 * grad_bytes * (N-1)/N / ici_bw + latency)
    eff(N)     = t_compute / (t_compute + t_comm(N))

(the ring all-reduce volume identity; reduce-scatter+all-gather moves
2S(N-1)/N bytes per chip over ICI).  Inputs are MEASURED single-chip
numbers (BENCH/profile artifacts); ICI bandwidth and per-collective latency
are swept over a conservative grid because the only chip available is a
single v5e — the day hardware appears, `bench.py --mesh` validates a
prediction instead of discovering a number.

Run:  PALLAS_AXON_POOL_IPS= python examples/scaling_model.py
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def param_bytes(cfg) -> int:
    import jax
    import jax.numpy as jnp

    from deep_q_learning_tpu.envs import make_env
    from deep_q_learning_tpu.models import QNetwork

    env, p = make_env(
        cfg.env_id, cfg.time_fraction_obs, cfg.max_steps_in_episode,
        param_overrides=cfg.env_param_overrides(),
    )
    net = QNetwork(num_actions=env.num_actions, hidden=cfg.hidden,
                   dueling=cfg.dueling)
    obs = jnp.zeros((1,) + env.obs_shape(p), jnp.float32)
    params = jax.eval_shape(lambda k: net.init(k, obs), jax.random.PRNGKey(0))
    return sum(
        leaf.size * leaf.dtype.itemsize for leaf in jax.tree.leaves(params)
    )


def model_for(name, cfg, measured_steps_per_s, envs_per_shard):
    spm = cfg.steps_per_superstep
    updates = spm / cfg.train_every
    gbytes = param_bytes(cfg)
    t_compute = envs_per_shard * spm / measured_steps_per_s  # s per superstep
    rows = []
    for bw_gbps in (45.0, 90.0, 180.0):  # per-chip ICI all-reduce bw grid
        for lat_us in (5.0, 25.0):
            for n in (2, 4, 8, 16):
                t_comm = updates * (
                    2.0 * gbytes * (n - 1) / n / (bw_gbps * 1e9) + lat_us * 1e-6
                )
                rows.append({
                    "n_chips": n,
                    "ici_bw_GBps": bw_gbps,
                    "collective_latency_us": lat_us,
                    "t_compute_ms": round(t_compute * 1e3, 2),
                    "t_comm_ms": round(t_comm * 1e3, 4),
                    "predicted_efficiency": round(
                        t_compute / (t_compute + t_comm), 4
                    ),
                })
    return {
        "config": name,
        "envs_per_shard": envs_per_shard,
        "measured_single_chip_env_steps_per_s": measured_steps_per_s,
        "grad_bytes": gbytes,
        "updates_per_superstep": updates,
        "bytes_allreduced_per_superstep_per_chip_at_N8": round(
            2 * gbytes * 7 / 8 * updates
        ),
        "rows": rows,
    }


def main() -> None:
    import jax

    jax.config.update("jax_platforms", "cpu")

    from deep_q_learning_tpu.config import (
        cartpole_vector,
        lunar_jointed_scaled,
        lunar_per_scaled,
    )
    import dataclasses

    configs = [
        # measured single-chip numbers: r5 post-slot-major-storage runs
        # (final r5: slot-major + packed-aux storage; warm bench --inner values)
        ("cartpole@131072/shard",
         dataclasses.replace(cartpole_vector(), num_envs=131072),
         344_130_418.0, 131072),
        ("lunar_per_scaled@1024/shard", lunar_per_scaled(1024),
         10_548_520.0, 1024),
        ("lunar_jointed_scaled@1024/shard", lunar_jointed_scaled(1024),
         5_493_668.0, 1024),
    ]
    out = {
        "metric": "predicted_weak_scaling_efficiency",
        "model": (
            "eff(N) = t_compute / (t_compute + updates*(2*grad_bytes*(N-1)/N"
            "/ici_bw + latency)); DP over the env axis, replicated learner, "
            "gradient pmean is the only volume collective"
        ),
        "caveats": [
            "single v5e available: ici_bw/latency are swept, not measured",
            "the virtual CPU-mesh artifact (weak_scaling_cpu_mesh.json) is a "
            "shared-core LOWER bound on program correctness, not hardware "
            "efficiency; this model is the hardware prediction",
            "prediction: >=80% efficiency holds through N=16 with >=45 GB/s "
            "ICI for every headline config — worst case 91.2% (the r5 "
            "storage speedups cut per-shard compute ~5x, so the comm share "
            "grew vs r4's 97.6%, still clearing the target with margin)",
        ],
        "configs": [model_for(*c) for c in configs],
    }
    path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                        "artifacts", "scaling_model.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    worst = min(
        r["predicted_efficiency"] for c in out["configs"] for r in c["rows"]
    )
    print(json.dumps({"worst_case_predicted_efficiency": worst,
                      "wrote": path}))


if __name__ == "__main__":
    main()
