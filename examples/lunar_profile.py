"""Attribute LunarLander superstep time across actor/env/replay/learner.

VERDICT r2 item 3: the physics program is the flagship workload (1.65M
env-steps/s @1024 envs in BENCH_r02) and nothing said where the time goes.
`jax.profiler` device traces are not available over the axon tunnel, so the
attribution is done by ABLATION, exploiting the traced-hyperparameter design
(algos/dqn.py::HyperParams): `training_start`/`train_every` are runtime
values, so the learner can be switched off WITHOUT recompiling — the full and
no-learner measurements run the SAME executable.

Measured phases (all at 1024 envs, lunar_per cadences, steps_per_superstep
from the preset):

  lunar full          actor + physics + replay-write + PER-sample + update
  lunar no-learner    actor + physics + replay-write      (training_start=2^30)
  lunar no-pallas     full, jnp sampler/TD path           (separate program)
  cartpole matched    same cadences, trivial env          (separate program)
  cartpole no-learner actor + trivial env + replay-write

Derived:
  learner cost  = full - no_learner        (PER sample + TD update + sync)
  physics cost ~= lunar_no_learner - cartpole_no_learner
  pallas gain   = full vs no_pallas

Writes artifacts/lunar_profile.json.  Run on the TPU (no other TPU job!):
    PYTHONPATH=/root/repo python examples/lunar_profile.py
"""

from __future__ import annotations

import dataclasses
import json
import os
import time

import jax
import jax.numpy as jnp

from deep_q_learning_tpu.config import lunar_per, cartpole_vector
from deep_q_learning_tpu.envs import VectorEnv, make_env
from deep_q_learning_tpu.models import QNetwork
from deep_q_learning_tpu.replay import make_replay
from deep_q_learning_tpu.algos import build_superstep, make_optimizer
from deep_q_learning_tpu.utils import aot

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
AOT_DIR = os.path.join(REPO, "runs", "aot_cache")
NUM_ENVS = 1024


def build(cfg):
    env, p = make_env(
        cfg.env_id, cfg.time_fraction_obs, cfg.max_steps_in_episode,
        param_overrides=cfg.env_param_overrides(),
    )
    venv = VectorEnv(env, cfg.num_envs)
    net = QNetwork(num_actions=env.num_actions, hidden=cfg.hidden, dueling=cfg.dueling)
    replay = make_replay(cfg)
    init_runner, superstep = build_superstep(venv, p, net, make_optimizer(cfg), replay, cfg)
    runner = jax.jit(init_runner)(jax.random.PRNGKey(0))  # jitted: eager init is minutes of small dispatches over the tunnel
    t0 = time.perf_counter()
    step = aot.load_or_compile(
        jax.jit(superstep, donate_argnums=0), runner, cache_dir=AOT_DIR,
        verbose=True, salt=aot.config_salt(cfg),
    )
    compile_s = time.perf_counter() - t0
    return runner, step, cfg, compile_s


def measure(runner, step, cfg, warmup=4, reps=3, n=10):
    for _ in range(warmup):
        runner, m = step(runner)
    float(m.window_mean)
    best = 0.0
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(n):
            runner, m = step(runner)
        float(m.window_mean)
        dt = time.perf_counter() - t0
        best = max(best, n * cfg.steps_per_superstep * cfg.num_envs / dt)
    return best, runner


def no_learner(runner):
    h = runner.hyper
    return runner.replace(
        hyper=h.replace(training_start=jnp.asarray(1 << 30, h.training_start.dtype))
    )


def main():
    out = {"num_envs": NUM_ENVS, "backend": jax.default_backend()}

    lcfg = dataclasses.replace(
        lunar_per(), num_envs=NUM_ENVS, buffer_capacity=max(1 << 19, NUM_ENVS * 64)
    )
    runner, step, cfg, comp = build(lcfg)
    out["lunar_compile_s"] = round(comp, 1)
    v, runner = measure(runner, step, cfg)
    out["lunar_full"] = round(v)
    v, _ = measure(no_learner(runner), step, cfg)
    out["lunar_no_learner"] = round(v)
    print(json.dumps(out), flush=True)

    # pure-XLA sampler/TD path (separate compile)
    runner, step, cfg, comp = build(dataclasses.replace(lcfg, use_pallas=False))
    out["lunar_no_pallas_compile_s"] = round(comp, 1)
    v, _ = measure(runner, step, cfg)
    out["lunar_no_pallas"] = round(v)
    print(json.dumps(out), flush=True)

    # trivial-env floor with matched cadences/batch/network-depth
    ccfg = dataclasses.replace(
        lunar_per(),
        env_id="CartPole-v1",
        num_envs=NUM_ENVS,
        buffer_capacity=max(1 << 19, NUM_ENVS * 64),
        use_pallas=True,
    )
    runner, step, cfg, comp = build(ccfg)
    out["cartpole_compile_s"] = round(comp, 1)
    v, runner = measure(runner, step, cfg)
    out["cartpole_matched_full"] = round(v)
    v, _ = measure(no_learner(runner), step, cfg)
    out["cartpole_matched_no_learner"] = round(v)

    # derived attribution (per-frame microseconds at 1024 envs)
    spf = lambda steps_per_s: 1e6 * NUM_ENVS / steps_per_s  # us per vector frame
    full, nol = out["lunar_full"], out["lunar_no_learner"]
    cfull, cnol = out["cartpole_matched_full"], out["cartpole_matched_no_learner"]
    out["derived_us_per_frame"] = {
        "lunar_total": round(spf(full), 1),
        "learner_phase": round(spf(full) - spf(nol), 1),
        "physics_vs_trivial_env": round(spf(nol) - spf(cnol), 1),
        "actor_env_replay_floor": round(spf(cnol), 1),
        "cartpole_learner_phase": round(spf(cfull) - spf(cnol), 1),
    }
    out["pallas_speedup"] = round(out["lunar_full"] / out["lunar_no_pallas"], 3)

    with open(os.path.join(REPO, "artifacts", "lunar_profile.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
