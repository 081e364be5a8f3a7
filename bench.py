"""Benchmark: aggregate env-steps/s with full training enabled.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

The workload is BASELINE.json config 2 (CartPole vanilla DQN, 4096 lockstep
pure-JAX envs) with the learner ON (train_every=1): every counted env step is
produced by the full actor+replay+update superstep, not an actor-only loop.

``vs_baseline`` compares against the 1M env-steps/s north-star aggregate
target from BASELINE.json (the reference publishes no throughput numbers —
its host loop steps ONE Gym env at a time; SURVEY.md §6).

Timing notes: the remote-TPU dispatch queue is asynchronous, so the loop is
timed against a host-side scalar fetch of the final metrics, after a warmup
superstep, and the measurement is repeated — see .claude/skills/verify.
"""

import json
import time

import jax


def run_bench(seconds_budget: float = 60.0):
    from deep_q_learning_tpu.config import cartpole_vector
    from deep_q_learning_tpu.envs import VectorEnv, make_env
    from deep_q_learning_tpu.models import QNetwork
    from deep_q_learning_tpu.replay import UniformReplay
    from deep_q_learning_tpu.algos import build_superstep, make_optimizer

    cfg = cartpole_vector()
    env, p = make_env(cfg.env_id, cfg.time_fraction_obs, cfg.max_steps_in_episode)
    venv = VectorEnv(env, cfg.num_envs)
    net = QNetwork(num_actions=env.num_actions, hidden=cfg.hidden, dueling=cfg.dueling)
    replay = UniformReplay(cfg.num_envs, cfg.capacity_per_env)
    init_runner, superstep = build_superstep(
        venv, p, net, make_optimizer(cfg), replay, cfg
    )
    runner = init_runner(jax.random.PRNGKey(0))
    step = jax.jit(superstep, donate_argnums=0)

    # warmup: compile + fill the buffer past training_start so the timed
    # region runs the full learner path
    for _ in range(4):
        runner, m = step(runner)
    float(m.window_mean)

    steps_per_call = cfg.steps_per_superstep * cfg.num_envs
    best = 0.0
    for _ in range(3):
        n = 50
        t0 = time.perf_counter()
        for _ in range(n):
            runner, m = step(runner)
        float(m.window_mean)  # host sync: don't trust async dispatch timing
        dt = time.perf_counter() - t0
        best = max(best, n * steps_per_call / dt)
        if time.perf_counter() - t0 > seconds_budget:
            break
    return best


if __name__ == "__main__":
    value = run_bench()
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
