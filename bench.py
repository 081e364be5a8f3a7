"""Benchmark: aggregate env-steps/s with full training enabled.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

Workload: BASELINE.json config 2 (CartPole vanilla DQN on vectorized pure-JAX
envs) with the learner ON (train_every=1, batch 512): every counted env step
comes from the full actor+replay+update superstep.  The instance count
defaults to 131072 — measured single-chip sweep (artifacts/
throughput_sweep.json): 4.1M steps/s at 4096 envs (dispatch-latency-bound
over the remote tunnel), 48M at 16384, 64M at 65536, 70.7M at 131072 (the
peak; 262144+ dips to ~60M, HBM-bound on env state + replay traffic).

``vs_baseline`` compares against the 1M env-steps/s north-star aggregate
target from BASELINE.json (the reference publishes no throughput numbers —
its host loop steps ONE Gym env at a time; SURVEY.md §6).

Robustness: the remote TPU compile service has high latency variance, so the
preferred (large) configs run in time-boxed subprocesses; on timeout the
benchmark falls back to a smaller config whose compile is reliably fast.
Compiled executables are cached on disk (utils/aot.py), so reruns skip the
compile service entirely.  Timing is against host-side scalar fetches (the
tunnel's dispatch queue is async; see .claude/skills/verify).
"""

import json
import os
import subprocess
import sys
import time


def run_bench(num_envs: int) -> float:
    import dataclasses

    import jax

    from deep_q_learning_tpu.config import cartpole_vector
    from deep_q_learning_tpu.envs import VectorEnv, make_env
    from deep_q_learning_tpu.models import QNetwork
    from deep_q_learning_tpu.replay import make_replay
    from deep_q_learning_tpu.algos import build_superstep, make_optimizer

    cfg = dataclasses.replace(
        cartpole_vector(),
        num_envs=num_envs,
        buffer_capacity=max(1 << 20, num_envs * 64),
    )
    env, p = make_env(cfg.env_id, cfg.time_fraction_obs, cfg.max_steps_in_episode)
    venv = VectorEnv(env, cfg.num_envs)
    net = QNetwork(num_actions=env.num_actions, hidden=cfg.hidden, dueling=cfg.dueling)
    replay = make_replay(cfg)
    init_runner, superstep = build_superstep(
        venv, p, net, make_optimizer(cfg), replay, cfg
    )
    runner = init_runner(jax.random.PRNGKey(0))
    from deep_q_learning_tpu.utils import aot

    step = aot.load_or_compile(
        jax.jit(superstep, donate_argnums=0),
        runner,
        cache_dir=os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "runs", "aot_cache"),
    )

    # warmup: compile + fill the buffer past training_start so the timed
    # region runs the full learner path
    for _ in range(4):
        runner, m = step(runner)
    float(m.window_mean)

    steps_per_call = cfg.steps_per_superstep * cfg.num_envs
    best = 0.0
    for _ in range(3):
        n = 30
        t0 = time.perf_counter()
        for _ in range(n):
            runner, m = step(runner)
        float(m.window_mean)  # host sync: don't trust async dispatch timing
        dt = time.perf_counter() - t0
        best = max(best, n * steps_per_call / dt)
    return best


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--inner":
        # time-boxed child: measure and print the raw number
        print(json.dumps({"value": run_bench(int(sys.argv[2]))}))
        return

    value = None
    # large-config attempts, biggest first (each time-boxed: remote-compile
    # variance must not blow the caller's budget; the on-disk executable
    # cache makes reruns immune to it), then the reliably-fast small config
    for num_envs, budget in ((131072, 420), (16384, 300)):
        try:
            out = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--inner", str(num_envs)],
                capture_output=True,
                text=True,
                timeout=budget,
            )
            for line in out.stdout.splitlines():
                if line.startswith("{"):
                    value = json.loads(line)["value"]
        except (subprocess.TimeoutExpired, Exception):
            value = None
        if value is not None:
            break
    if value is None:  # fallback: small config, reliably fast compile
        value = run_bench(4096)

    baseline = 1_000_000.0  # BASELINE.json north-star aggregate env-steps/s
    print(
        json.dumps(
            {
                "metric": "env_steps_per_s_training_on",
                "value": round(value),
                "unit": "env-steps/s",
                "vs_baseline": round(value / baseline, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
