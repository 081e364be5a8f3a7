"""TPU throughput sweep of the jointed solver's iteration counts
(VERDICT r4 missing #1 / next-round item 1).

Measures the REAL bench program (lunar_jointed_scaled @ num_envs) with
(vel_iters, pos_iters, vel_tol) overridden, bench.py's timing methodology
(host-scalar fetch per block, best of reps).  Decides what the fidelity
engine's throughput presets should ship.

Usage (TPU):  python examples/jointed_iters_sweep.py [--envs 1024]
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
AOT_DIR = os.path.join(REPO, "runs", "aot_cache")


def measure(cfg, reps=3, inner=20):
    import jax

    from deep_q_learning_tpu.algos import build_superstep, make_optimizer
    from deep_q_learning_tpu.envs import VectorEnv, make_env
    from deep_q_learning_tpu.models import QNetwork
    from deep_q_learning_tpu.replay import make_replay
    from deep_q_learning_tpu.utils import aot

    env, p = make_env(
        cfg.env_id, cfg.time_fraction_obs, cfg.max_steps_in_episode,
        param_overrides=cfg.env_param_overrides(),
    )
    venv = VectorEnv(env, cfg.num_envs)
    net = QNetwork(num_actions=env.num_actions, hidden=cfg.hidden,
                   dueling=cfg.dueling)
    replay = make_replay(cfg)
    init_runner, superstep = build_superstep(
        venv, p, net, make_optimizer(cfg), replay, cfg
    )
    runner = jax.jit(init_runner)(jax.random.PRNGKey(0))
    t0 = time.perf_counter()
    step = aot.load_or_compile(
        jax.jit(superstep, donate_argnums=0), runner, cache_dir=AOT_DIR,
        verbose=True, salt=aot.config_salt(cfg),
    )
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(4):
        runner, m = step(runner)
    float(m.window_mean)
    first_s = time.perf_counter() - t0
    best = 0.0
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(inner):
            runner, m = step(runner)
        float(m.window_mean)
        dt = time.perf_counter() - t0
        best = max(best, inner * cfg.steps_per_superstep * cfg.num_envs / dt)
    return best, compile_s, first_s


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--envs", type=int, default=1024)
    ap.add_argument("--settings", type=str, default=None,
                    help="semicolon list 'vel,pos,tol' e.g. '120,40,0;80,30,0'")
    args = ap.parse_args()

    from deep_q_learning_tpu.config import lunar_jointed_scaled

    settings = (
        [tuple(float(x) for x in s.split(",")) for s in args.settings.split(";")]
        if args.settings
        else [(120, 40, 0.0), (100, 36, 0.0), (80, 30, 0.0), (64, 24, 0.0),
              (120, 40, 1e-4)]
    )
    rows = []
    for vel, pos, tol in settings:
        cfg = dataclasses.replace(
            lunar_jointed_scaled(args.envs),
            lander_vel_iters=int(vel), lander_pos_iters=int(pos),
            lander_vel_tol=tol,
        )
        sps, compile_s, first_s = measure(cfg)
        row = {
            "vel_iters": int(vel), "pos_iters": int(pos), "vel_tol": tol,
            "env_steps_per_s": round(sps), "compile_s": round(compile_s, 1),
            "first4_s": round(first_s, 1),
        }
        rows.append(row)
        print(json.dumps(row), flush=True)
    out = {
        "metric": "lunar_jointed_iteration_sweep",
        "num_envs": args.envs,
        "rows": rows,
    }
    path = os.path.join(REPO, "artifacts", "jointed_iters_sweep.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
