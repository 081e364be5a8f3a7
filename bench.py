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


def run_bench(num_envs: int, preset: str = "cartpole") -> float:
    import dataclasses

    import jax

    from deep_q_learning_tpu.config import cartpole_vector, lunar_per
    from deep_q_learning_tpu.envs import VectorEnv, make_env
    from deep_q_learning_tpu.models import QNetwork
    from deep_q_learning_tpu.replay import make_replay
    from deep_q_learning_tpu.algos import build_superstep, make_optimizer

    if preset == "lunar":
        # the physics-heavy program: dueling DDQN + PER with the Pallas
        # kernels on (VERDICT r1 item 8 — regressions in the contact solver
        # or the Mosaic kernels must show up in the driver metric)
        cfg = dataclasses.replace(
            lunar_per(),
            num_envs=num_envs,
            buffer_capacity=max(1 << 19, num_envs * 64),
        )
    else:
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


def _timeboxed(num_envs: int, budget: int, preset: str = "cartpole"):
    """Run one measurement in a time-boxed child (remote-compile variance
    must not blow the caller's budget; the on-disk executable cache makes
    reruns immune to it)."""
    try:
        out = subprocess.run(
            [
                sys.executable,
                os.path.abspath(__file__),
                "--inner",
                str(num_envs),
                preset,
            ],
            capture_output=True,
            text=True,
            timeout=budget,
        )
        for line in out.stdout.splitlines():
            if line.startswith("{"):
                return json.loads(line)["value"]
    except (subprocess.TimeoutExpired, Exception):
        pass
    return None


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--inner":
        # time-boxed child: measure and print the raw number
        preset = sys.argv[3] if len(sys.argv) > 3 else "cartpole"
        print(json.dumps({"value": run_bench(int(sys.argv[2]), preset)}))
        return

    value = None
    # large-config attempts, biggest first, then the reliably-fast small one
    for num_envs, budget in ((131072, 420), (16384, 300)):
        value = _timeboxed(num_envs, budget)
        if value is not None:
            break
    if value is None:  # fallback: small config, reliably fast compile
        value = run_bench(4096)

    # second line item: LunarLander (physics + Pallas kernels), 1024 envs —
    # same JSON line so the driver contract (ONE line) holds
    lunar = _timeboxed(1024, 420, "lunar")

    baseline = 1_000_000.0  # BASELINE.json north-star aggregate env-steps/s
    print(
        json.dumps(
            {
                "metric": "env_steps_per_s_training_on",
                "value": round(value),
                "unit": "env-steps/s",
                "vs_baseline": round(value / baseline, 3),
                "lunar_per_1024envs_env_steps_per_s": (
                    round(lunar) if lunar is not None else None
                ),
            }
        )
    )


if __name__ == "__main__":
    main()
