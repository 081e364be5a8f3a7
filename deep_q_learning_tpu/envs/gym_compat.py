"""Cross-validation harness against Gym's reference environments.

BASELINE.json asks for trajectory fidelity of the pure-JAX envs.  Two tiers:

1. **Self-parity (always available, tested in CI):** fixed-seed bitwise
   reproducibility of the jitted dynamics, plus step-for-step parity of
   CartPole against an independent numpy transcription of the published
   equations (tests/test_envs_cartpole.py).

2. **Gym parity (this module; requires ``gym``/``gymnasium`` + Box2D, which
   the build image does not ship):** step the host env and the pure-JAX env
   with the same action sequence from matched initial states and report
   per-step divergence.  CartPole matches to float tolerance (identical
   closed-form dynamics).  LunarLander is expected to diverge step-wise —
   the JAX env replaces Box2D's sequential-impulse solver with an analytic
   contact model (see envs/lunar_lander.py docstring); the meaningful
   metrics are the task-level ones also reported here (heuristic-controller
   landing rate / returns on both).
"""

from __future__ import annotations

from typing import Optional

import numpy as np


def _import_gym():
    try:
        import gymnasium as gym  # modern API

        return gym, 5
    except ImportError:
        pass
    try:
        import gym  # classic API

        return gym, 4
    except ImportError:
        return None, 0


def compare_cartpole(num_steps: int = 200, seed: int = 0) -> Optional[dict]:
    """Step Gym's CartPole and ours with the same actions from the same
    state; returns max per-dimension divergence (None if gym missing)."""
    gym, api = _import_gym()
    if gym is None:
        return None
    import jax
    import jax.numpy as jnp

    from deep_q_learning_tpu.envs import CartPole

    genv = gym.make("CartPole-v1").unwrapped
    out = genv.reset(seed=seed) if api == 5 else genv.reset()
    gobs = np.asarray(out[0] if isinstance(out, tuple) else out, np.float32)

    env = CartPole()
    p = env.default_params()
    _, state = env.reset(jax.random.PRNGKey(0), p)
    # match initial state exactly
    state = state.replace(
        x=jnp.float32(gobs[0]),
        x_dot=jnp.float32(gobs[1]),
        theta=jnp.float32(gobs[2]),
        theta_dot=jnp.float32(gobs[3]),
    )
    step = jax.jit(env.step)
    rng = np.random.RandomState(seed)
    max_err = 0.0
    steps = 0
    for t in range(num_steps):
        a = int(rng.randint(2))
        gout = genv.step(a)
        gobs = np.asarray(gout[0], np.float32)
        gdone = bool(gout[2]) or (api == 5 and bool(gout[3]))
        jobs, state, _, term, trunc = step(jax.random.PRNGKey(t), state, jnp.int32(a), p)
        max_err = max(max_err, float(np.max(np.abs(np.asarray(jobs) - gobs))))
        steps = t + 1
        if gdone or bool(term):
            break
    return {"steps_compared": steps, "max_abs_err": max_err}


def compare_lunar_task_level(episodes: int = 10, seed: int = 0) -> Optional[dict]:
    """Run the heuristic controller on Gym's Box2D LunarLander and on the
    pure-JAX env; returns mean returns + landing rates on both."""
    gym, api = _import_gym()
    if gym is None:
        return None
    import jax
    import jax.numpy as jnp

    from deep_q_learning_tpu.envs import LunarLander, heuristic_action

    # Gym side
    genv = gym.make("LunarLander-v2").unwrapped
    g_rets = []
    for ep in range(episodes):
        out = genv.reset(seed=seed + ep) if api == 5 else genv.reset()
        obs = np.asarray(out[0] if isinstance(out, tuple) else out, np.float32)
        total = 0.0
        for _ in range(1000):
            a = int(heuristic_action(jnp.asarray(obs)))
            gout = genv.step(a)
            obs = np.asarray(gout[0], np.float32)
            total += float(gout[1])
            done = bool(gout[2]) or (api == 5 and bool(gout[3]))
            if done:
                break
        g_rets.append(total)

    # JAX side
    env = LunarLander()
    p = env.default_params()
    step = jax.jit(env.step)
    j_rets = []
    for ep in range(episodes):
        obs, st = env.reset(jax.random.PRNGKey(seed + ep), p)
        total = 0.0
        for t in range(1000):
            a = heuristic_action(obs)
            obs, st, r, term, trunc = step(jax.random.PRNGKey(ep * 7919 + t), st, a, p)
            total += float(r)
            if bool(term) or bool(trunc):
                break
        j_rets.append(total)

    return {
        "gym_mean_return": float(np.mean(g_rets)),
        "gym_land_rate": float(np.mean([r > 200 for r in g_rets])),
        "jax_mean_return": float(np.mean(j_rets)),
        "jax_land_rate": float(np.mean([r > 200 for r in j_rets])),
    }


if __name__ == "__main__":
    print("cartpole:", compare_cartpole())
    print("lunar task-level:", compare_lunar_task_level())
