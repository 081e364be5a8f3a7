"""Ablation profile of the cartpole headline config (VERDICT r4 weak #4).

Method of artifacts/lunar_profile.json: measure the full superstep, then
variants with components removed/changed, and attribute the differences.
Variants:

  * full            — cartpole_vector @ N envs (the bench headline program)
  * no_learner      — train_every pushed past the horizon: actor + env +
                      replay-add + RNG floor
  * tiny_net        — no_learner with hidden=(16,): isolates the actor
                      (argmax Q) forward-pass share of the floor
  * env_only        — bare frame loop (env step + RNG + constant actions):
                      no network, no replay
  * bf16            — full with compute_dtype=bfloat16 (VERDICT: unbenched
                      at the headline shape)

Roofline accounting is printed from first principles (actor MACs/frame vs
v5e peak, replay-add HBM bytes vs HBM bw).

Usage (TPU):  python examples/cartpole_profile.py [--envs 131072]
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


def build(cfg):
    import jax

    from deep_q_learning_tpu.algos import build_superstep, make_optimizer
    from deep_q_learning_tpu.envs import VectorEnv, make_env
    from deep_q_learning_tpu.models import QNetwork
    from deep_q_learning_tpu.replay import make_replay
    from deep_q_learning_tpu.utils import aot
    import jax.numpy as jnp

    env, p = make_env(cfg.env_id, cfg.time_fraction_obs, cfg.max_steps_in_episode)
    venv = VectorEnv(env, cfg.num_envs)
    net = QNetwork(
        num_actions=env.num_actions, hidden=cfg.hidden, dueling=cfg.dueling,
        compute_dtype=jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32,
    )
    replay = make_replay(cfg)
    init_runner, superstep = build_superstep(
        venv, p, net, make_optimizer(cfg), replay, cfg
    )
    runner = jax.jit(init_runner)(jax.random.PRNGKey(0))
    step = aot.load_or_compile(
        jax.jit(superstep, donate_argnums=0), runner, cache_dir=AOT_DIR,
        verbose=True, salt=aot.config_salt(cfg) + f";prof={cfg.compute_dtype}",
    )
    return runner, step


def measure(runner, step, cfg, reps=3, inner=20):
    for _ in range(4):
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


def env_only_loop(num_envs: int, frames: int):
    import jax
    import jax.numpy as jnp

    from deep_q_learning_tpu.envs import VectorEnv, make_env

    env, p = make_env("CartPole-v1", False, None)
    venv = VectorEnv(env, num_envs)

    def run(key):
        obs, states = venv.reset(key, p)

        def body(i, carry):
            obs, states, k = carry
            k, sk = jax.random.split(k)
            actions = jnp.zeros((num_envs,), jnp.int32)
            obs, states, tr = venv.step(sk, states, actions, p)
            return obs, states, k

        obs, states, _ = jax.lax.fori_loop(0, frames, body, (obs, states, key))
        return jnp.sum(obs[:, 0])

    fn = jax.jit(run)
    key = jax.random.PRNGKey(0)
    float(fn(key))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(fn(key))
        best = min(best, time.perf_counter() - t0)
    return frames * num_envs / best


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--envs", type=int, default=131072)
    args = ap.parse_args()

    import jax

    from deep_q_learning_tpu.config import cartpole_vector

    base = dataclasses.replace(
        cartpole_vector(),
        num_envs=args.envs,
        buffer_capacity=max(1 << 20, args.envs * 64),
    )
    variants = {}
    for name, cfg in [
        ("full", base),
        ("no_learner", dataclasses.replace(base, train_every=1 << 30)),
        ("tiny_net", dataclasses.replace(base, train_every=1 << 30, hidden=(16,))),
        ("bf16", dataclasses.replace(base, compute_dtype="bfloat16")),
    ]:
        runner, step = build(cfg)
        variants[name] = round(measure(runner, step, cfg))
        print(f"{name}: {variants[name]:,} env-steps/s", flush=True)
        del runner, step
    variants["env_only"] = round(env_only_loop(args.envs, 256))
    print(f"env_only: {variants['env_only']:,} env-steps/s", flush=True)

    # per-frame attribution (us per vector frame of N envs)
    us = {k: round(args.envs / v * 1e6, 1) for k, v in variants.items()}
    attribution = {
        "learner_us": round(us["full"] - us["no_learner"], 1),
        "actor_us": round(us["no_learner"] - us["tiny_net"], 1),
        "replay_add_plus_tiny_actor_us": round(us["tiny_net"] - us["env_only"], 1),
        "env_rng_us": us["env_only"],
    }
    # roofline: actor forward MACs per frame (f32)
    h = base.hidden
    macs = args.envs * (4 * h[0] + h[0] * h[1] + h[1] * 2)
    frames_per_s = variants["full"] / args.envs
    actor_tflops = 2 * macs * frames_per_s / 1e12
    out = {
        "metric": "cartpole_headline_profile",
        "num_envs": args.envs,
        "env_steps_per_s": variants,
        "us_per_vector_frame": us,
        "attribution_us_per_frame": attribution,
        "roofline": {
            "actor_fwd_tflops_sustained": round(actor_tflops, 2),
            "v5e_f32_peak_tflops_approx": 49,
            "actor_mfu_f32": round(actor_tflops / 49, 3),
            "replay_add_GBps": round(
                args.envs * 40 * frames_per_s / 1e9, 2
            ),
        },
        "backend": jax.default_backend(),
    }
    print(json.dumps(out))
    with open(os.path.join(REPO, "artifacts", "cartpole_profile.json"), "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
