"""CartPole physics tests: parity vs an independent numpy transcription of the
published CartPole-v1 equations, fixed-seed determinism (jit vs eager), and
auto-reset semantics of the vector wrapper."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deep_q_learning_tpu.envs import CartPole, TimeFractionObs, VectorEnv


def numpy_cartpole_step(state, action, p):
    """Independent host-side reference of the same published dynamics."""
    x, x_dot, theta, theta_dot = state
    force = 10.0 if action == 1 else -10.0
    costheta, sintheta = np.cos(theta), np.sin(theta)
    total_mass = 1.0 + 0.1
    polemass_length = 0.1 * 0.5
    temp = (force + polemass_length * theta_dot**2 * sintheta) / total_mass
    thetaacc = (9.8 * sintheta - costheta * temp) / (
        0.5 * (4.0 / 3.0 - 0.1 * costheta**2 / total_mass)
    )
    xacc = temp - polemass_length * thetaacc * costheta / total_mass
    tau = 0.02
    return np.array(
        [x + tau * x_dot, x_dot + tau * xacc, theta + tau * theta_dot, theta_dot + tau * thetaacc],
        np.float32,
    )


def test_physics_matches_numpy_reference():
    env = CartPole()
    p = env.default_params()
    key = jax.random.PRNGKey(0)
    obs, state = env.reset(key, p)
    np_state = np.asarray(obs)
    step = jax.jit(env.step, static_argnums=())
    rng = np.random.RandomState(0)
    for t in range(50):
        a = int(rng.randint(2))
        obs, state, r, term, trunc = step(jax.random.PRNGKey(t), state, jnp.int32(a), p)
        np_state = numpy_cartpole_step(np_state, a, p)
        np.testing.assert_allclose(np.asarray(obs), np_state, rtol=1e-5, atol=1e-6)
        assert r == 1.0
        if bool(term):
            break


def test_fixed_seed_determinism_jit_vs_eager():
    env = CartPole()
    p = env.default_params()

    def rollout(stepper):
        obs, state = env.reset(jax.random.PRNGKey(42), p)
        traj = [obs]
        for t in range(30):
            a = jnp.int32(t % 2)
            obs, state, r, term, trunc = stepper(jax.random.PRNGKey(t), state, a, p)
            traj.append(obs)
        return jnp.stack(traj)

    jit_step = jax.jit(env.step)
    # bitwise: the same compiled program must reproduce trajectories exactly
    run1 = rollout(jit_step)
    run2 = rollout(jit_step)
    np.testing.assert_array_equal(np.asarray(run1), np.asarray(run2))
    # eager vs jit may differ by fusion reassociation only (float noise)
    eager = rollout(env.step)
    np.testing.assert_allclose(np.asarray(eager), np.asarray(run1), rtol=1e-4, atol=1e-6)


def test_termination_bounds():
    env = CartPole()
    p = env.default_params()
    _, state = env.reset(jax.random.PRNGKey(0), p)
    # push cart past the +x threshold
    state = state.replace(x=jnp.float32(2.5))
    obs, state2, r, term, trunc = env.step(jax.random.PRNGKey(1), state, jnp.int32(1), p)
    assert bool(term)
    assert not bool(trunc)


def test_truncation_at_max_steps():
    env = CartPole()
    p = env.default_params().replace(max_steps_in_episode=5)
    obs, state = env.reset(jax.random.PRNGKey(0), p)
    term = trunc = False
    for t in range(5):
        obs, state, r, term, trunc = env.step(jax.random.PRNGKey(t), state, jnp.int32(t % 2), p)
    assert bool(trunc) or bool(term)
    if bool(trunc):
        assert not bool(term)  # truncation and termination are exclusive


def test_vector_env_autoreset():
    env = CartPole()
    p = env.default_params().replace(max_steps_in_episode=3)
    venv = VectorEnv(env, 8)
    obs, states = venv.reset(jax.random.PRNGKey(0), p)
    assert obs.shape == (8, 4)
    step = jax.jit(lambda k, s, a: venv.step(k, s, a, p))
    for t in range(3):
        actions = jnp.zeros((8,), jnp.int32)
        obs, states, tr = step(jax.random.PRNGKey(t), states, actions)
    # all envs hit the 3-step truncation (or terminated) -> auto-reset: t == 0
    assert bool(jnp.all(states.t == 0))
    done = np.asarray(tr.terminated | tr.truncated)
    assert done.all()
    # transition.next_obs is the PRE-reset obs; out obs is the fresh one
    assert not np.allclose(np.asarray(tr.next_obs), np.asarray(obs))


def test_time_fraction_obs_wrapper():
    env = TimeFractionObs(CartPole())
    p = env.default_params().replace(max_steps_in_episode=10)
    obs, state = env.reset(jax.random.PRNGKey(0), p)
    assert obs.shape == (5,)
    assert obs[-1] == 0.0
    for t in range(4):
        obs, state, *_ = env.step(jax.random.PRNGKey(t), state, jnp.int32(0), p)
    np.testing.assert_allclose(float(obs[-1]), 4 / 10, rtol=1e-6)


def test_gym_parity_harness():
    """When gym+Box2D are installed, CartPole must match step-for-step to
    float tolerance; skipped in this image (zero-egress, no gym)."""
    from deep_q_learning_tpu.envs.gym_compat import compare_cartpole

    result = compare_cartpole(num_steps=100, seed=0)
    if result is None:
        pytest.skip("gym not installed")
    assert result["max_abs_err"] < 1e-4, result
