"""Measure the Pallas-vs-XLA crossover for the lunar PER program by shape.

VERDICT r3 weak #4 / item 7: the fused Pallas TD+huber kernel and the MXU
PER sampler measured +42% at (128 envs, batch 256) — the `lunar_per` solving
shape — but ~1.00x at (1024, 1024), the shape `bench.py`'s scoreboard
measures.  This harness measures the full-superstep throughput with
``use_pallas`` on vs off across the shape family and records the measured
crossover; presets then pick the faster path per shape (config.py docstrings
cite the artifact).

Run on the TPU (no other TPU job):
    PYTHONPATH=/root/repo python examples/pallas_crossover.py [--quick]

Writes artifacts/pallas_crossover.json.
"""

from __future__ import annotations

import dataclasses
import json
import os
import sys
import time

import jax

from deep_q_learning_tpu.config import lunar_per
from deep_q_learning_tpu.envs import VectorEnv, make_env
from deep_q_learning_tpu.models import QNetwork
from deep_q_learning_tpu.replay import make_replay
from deep_q_learning_tpu.algos import build_superstep, make_optimizer
from deep_q_learning_tpu.utils import aot

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
AOT_DIR = os.path.join(REPO, "runs", "aot_cache")

# (num_envs, batch_size, train_every): the solving shape, the benched shape,
# and the midpoint
SHAPES = [
    (128, 256, 1),
    (512, 512, 2),
    (1024, 1024, 4),
]


def measure(cfg, reps: int = 3, inner: int = 20) -> float:
    env, p = make_env(
        cfg.env_id, cfg.time_fraction_obs, cfg.max_steps_in_episode,
        param_overrides=cfg.env_param_overrides(),
    )
    venv = VectorEnv(env, cfg.num_envs)
    net = QNetwork(num_actions=env.num_actions, hidden=cfg.hidden, dueling=cfg.dueling)
    replay = make_replay(cfg)
    init_runner, superstep = build_superstep(
        venv, p, net, make_optimizer(cfg), replay, cfg
    )
    runner = jax.jit(init_runner)(jax.random.PRNGKey(0))  # jitted: eager init is minutes of small dispatches over the tunnel
    step = aot.load_or_compile(
        jax.jit(superstep, donate_argnums=0), runner, cache_dir=AOT_DIR,
        verbose=True, salt=aot.config_salt(cfg),
    )
    for _ in range(4):  # warmup + buffer fill past training_start
        runner, m = step(runner)
    float(m.window_mean)
    best = 0.0
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(inner):
            runner, m = step(runner)
        float(m.window_mean)
        dt = time.perf_counter() - t0
        best = max(best, inner * cfg.steps_per_superstep * cfg.num_envs / dt)
    return best


def main() -> None:
    quick = "--quick" in sys.argv
    shapes = SHAPES[-1:] if quick else SHAPES
    rows = []
    for num_envs, batch, train_every in shapes:
        row = {"num_envs": num_envs, "batch_size": batch, "train_every": train_every}
        for use_pallas in (False, True):
            cfg = dataclasses.replace(
                lunar_per(),
                num_envs=num_envs,
                batch_size=batch,
                train_every=train_every,
                target_tau=0.005 * train_every,
                buffer_capacity=max(1 << 19, num_envs * 64),
                use_pallas=use_pallas,
            )
            key = "pallas" if use_pallas else "xla"
            t0 = time.time()
            row[key] = round(measure(cfg))
            row[f"{key}_wall_s"] = round(time.time() - t0, 1)
            print(f"envs={num_envs} batch={batch} {key}: {row[key]:,}", flush=True)
        row["pallas_speedup"] = round(row["pallas"] / row["xla"], 3)
        rows.append(row)
    out = {
        "metric": "lunar_per_superstep_env_steps_per_s",
        "backend": jax.default_backend(),
        "rows": rows,
    }
    os.makedirs(os.path.join(REPO, "artifacts"), exist_ok=True)
    path = os.path.join(REPO, "artifacts", "pallas_crossover.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
