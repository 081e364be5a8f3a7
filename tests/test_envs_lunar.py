"""LunarLander pure-JAX env tests.

Task-level fidelity gates (module docstring of ``envs/lunar_lander.py``):
the heuristic controller must land (scores ≈200+, as it does on Box2D) and a
random policy must crash (strongly negative) — plus bitwise fixed-seed
reproducibility, observation layout, terrain, and reward-shaping algebra.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deep_q_learning_tpu.envs import (
    LunarLander,
    TimeFractionObs,
    VectorEnv,
    heuristic_action,
    make_env,
)
from deep_q_learning_tpu.envs.lunar_lander import (
    CHUNKS,
    FPS,
    H,
    HELIPAD_Y,
    LEG_DOWN,
    W,
)


@pytest.fixture(scope="module")
def env_and_params():
    env = LunarLander()
    return env, env.default_params()


def _rollout(env, p, seed, policy, max_t=1000):
    obs, st = env.reset(jax.random.PRNGKey(seed), p)
    step = jax.jit(env.step)
    rng = np.random.RandomState(seed)
    total = 0.0
    for t in range(max_t):
        a = heuristic_action(obs) if policy == "heuristic" else jnp.int32(rng.randint(4))
        obs, st, r, term, trunc = step(jax.random.PRNGKey(seed * 31 + t), st, a, p)
        total += float(r)
        if bool(term) or bool(trunc):
            break
    return total


def test_heuristic_lands(env_and_params):
    env, p = env_and_params
    rets = [_rollout(env, p, s, "heuristic") for s in range(8)]
    # Box2D heuristic also fails a fraction of seeds; require a clear landing
    # majority and a mean far above the random policy's ~-120.
    assert np.mean(rets) > 100, f"heuristic mean {np.mean(rets)}: physics not landable"
    assert sum(r > 200 for r in rets) >= 5, f"too few successful landings: {rets}"


def test_random_policy_crashes(env_and_params):
    env, p = env_and_params
    rets = [_rollout(env, p, s, "random") for s in range(5)]
    assert np.mean(rets) < -50, f"random policy should crash hard, got {rets}"


def test_fixed_seed_bitwise_reproducible(env_and_params):
    env, p = env_and_params
    step = jax.jit(env.step)

    def run():
        obs, st = env.reset(jax.random.PRNGKey(5), p)
        traj = [obs]
        for t in range(100):
            a = heuristic_action(obs)
            obs, st, r, term, trunc = step(jax.random.PRNGKey(t), st, a, p)
            traj.append(obs)
        return np.asarray(jnp.stack(traj))

    np.testing.assert_array_equal(run(), run())


def test_observation_layout(env_and_params):
    env, p = env_and_params
    obs, st = env.reset(jax.random.PRNGKey(0), p)
    assert obs.shape == (8,)
    # gym's reset ends with an internal step(0), so the first obs already has
    # one physics frame (gravity + the INITIAL_RANDOM kick) applied: x is
    # near — not exactly — center (max |vx| = 1000/M/FPS -> |obs0| <= ~0.008)
    assert abs(float(obs[0])) < 0.01
    assert float(obs[1]) > 0.5
    # legs not in contact at spawn
    assert float(obs[6]) == 0.0 and float(obs[7]) == 0.0
    # the kick is a force at the COM (no torque), but in the jointed engine
    # the legs snap to their joint anchors during the internal step, giving
    # the hull a small reaction rotation — real gym behavior: gymnasium's
    # reset obs shows |angle| up to ~0.007 (measured seeds 0-3).  The rigid
    # engine has exactly zero.
    limit = 0.05 if getattr(p, "jointed", False) else 1e-6
    assert abs(float(obs[4])) < limit


def test_terrain_helipad_flat(env_and_params):
    """The pad floor sits at 0.99*H/4: gym substitutes the helipad height
    across the center 5 raw indices BEFORE the 0.33 3-tap smoothing, so the
    smoothed surface is 0.33*3*helipad_y (gymnasium lunar_lander.py reset).
    The center 3 smoothed chunks are exactly flat at that value."""
    env, p = env_and_params
    _, st = env.reset(jax.random.PRNGKey(3), p)
    terrain = np.asarray(st.terrain)
    center = CHUNKS // 2
    np.testing.assert_allclose(
        terrain[center - 1 : center + 2], 0.99 * HELIPAD_Y, rtol=1e-6
    )


def test_shaping_formula(env_and_params):
    """Reward between two non-engine steps equals the published shaping delta."""
    env, p = env_and_params
    obs, st = env.reset(jax.random.PRNGKey(1), p)
    obs2, st2, r, term, trunc = env.step(jax.random.PRNGKey(0), st, jnp.int32(0), p)

    def shaping(o, l1, l2):
        return (
            -100 * np.sqrt(o[0] ** 2 + o[1] ** 2)
            - 100 * np.sqrt(o[2] ** 2 + o[3] ** 2)
            - 100 * abs(o[4])
            + 10 * l1
            + 10 * l2
        )

    s1 = shaping(np.asarray(obs), 0, 0)
    s2 = shaping(np.asarray(obs2), float(obs2[6]), float(obs2[7]))
    np.testing.assert_allclose(float(r), s2 - s1, rtol=1e-4, atol=1e-4)


def test_free_fall_crashes(env_and_params):
    env, p = env_and_params
    obs, st = env.reset(jax.random.PRNGKey(2), p)
    step = jax.jit(env.step)
    total, last_r = 0.0, 0.0
    for t in range(1000):
        obs, st, r, term, trunc = step(jax.random.PRNGKey(t), st, jnp.int32(0), p)
        total += float(r)
        last_r = float(r)
        if bool(term):
            break
    assert bool(term), "free fall must terminate"
    assert last_r == -100.0, "free-fall impact must be a crash"


def _shaping_of(obs):
    o = np.asarray(obs, np.float64)
    return (
        -100 * np.sqrt(o[0] ** 2 + o[1] ** 2)
        - 100 * np.sqrt(o[2] ** 2 + o[3] ** 2)
        - 100 * abs(o[4])
        + 10 * o[6]
        + 10 * o[7]
    )


def test_fuel_costs():
    """EXACT fuel constants: reward = (shaping' - shaping) - 0.30*main
    - 0.03*side (gymnasium lunar_lander.py step; ref trains on the same)."""
    env = LunarLander()
    p = env.default_params()
    obs0, st = env.reset(jax.random.PRNGKey(4), p)
    s0 = _shaping_of(obs0)
    key = jax.random.PRNGKey(0)
    for action, fuel in [(0, 0.0), (2, 0.30), (1, 0.03), (3, 0.03)]:
        obs1, _, r, term, _ = env.step(key, st, jnp.int32(action), p)
        assert not bool(term)
        expected = _shaping_of(obs1) - s0 - fuel
        np.testing.assert_allclose(float(r), expected, atol=2e-4), action


def test_registry_and_time_fraction():
    env, p = make_env("LunarLander-v2", time_fraction_obs=True, max_steps_in_episode=1500)
    assert env.obs_shape(p) == (9,)  # ref env.py:17 declares (1, 9)
    assert p.max_steps_in_episode == 1500
    obs, st = env.reset(jax.random.PRNGKey(0), p)
    assert obs.shape == (9,)
    assert float(obs[-1]) == 0.0
    with pytest.raises(ValueError):
        make_env("Breakout-v4")


def test_vectorized_lander():
    env = LunarLander()
    p = env.default_params()
    venv = VectorEnv(env, 64)
    obs, states = venv.reset(jax.random.PRNGKey(0), p)
    assert obs.shape == (64, 8)
    # terrains differ across instances (seeded per-env)
    terr = np.asarray(states.terrain)
    assert np.std(terr[:, 0]) > 0.01
    step = jax.jit(lambda k, s, a: venv.step(k, s, a, p))
    for t in range(5):
        obs, states, tr = step(jax.random.PRNGKey(t), states, jnp.zeros((64,), jnp.int32))
    assert np.isfinite(np.asarray(obs)).all()


def test_wind_pattern_and_gating():
    """Wind/turbulence unit semantics (VERDICT r4 missing #3; the Box2D
    cross-validation lives in test_gym_parity.py::test_lunar_wind_*):

    * ``_wind_pattern`` == gymnasium v3's ``tanh(sin(0.02 i) + sin(0.01 pi
      i))`` to f32 precision over the full counter range drawn at reset;
    * wind forces apply ONLY while airborne, and the pattern counters
      advance iff the force was applied (gymnasium lunar_lander.py:398-427).
    """
    import math

    from deep_q_learning_tpu.envs.lunar_lander import _wind_pattern

    for idx in range(-9999, 10000, 487):
        ref = math.tanh(math.sin(0.02 * idx) + math.sin(math.pi * 0.01 * idx))
        got = float(_wind_pattern(jnp.int32(idx)))
        # f32 sin at |arg| up to ~314 rad: observed <= ~1e-5 abs error
        assert abs(got - ref) < 5e-5, (idx, got, ref)

    env = LunarLander()
    p = env.default_params().replace(
        enable_wind=True, wind_power=15.0, turbulence_power=1.5,
        dispersion_scale=0.0,
    )
    p_off = p.replace(enable_wind=False)
    step = jax.jit(env.step, static_argnames=())
    _, st = env.reset(jax.random.PRNGKey(0), p)
    idx0 = int(st.wind_idx)

    # airborne: wind changes the trajectory and advances the counters
    _, st_w, _, _, _ = step(jax.random.PRNGKey(1), st, jnp.int32(0), p)
    _, st_o, _, _, _ = step(jax.random.PRNGKey(1), st, jnp.int32(0), p_off)
    assert int(st_w.wind_idx) == idx0 + 1
    assert int(st_o.wind_idx) == idx0
    assert float(jnp.abs(st_w.vx - st_o.vx)) > 0.0 or float(
        jnp.abs(st_w.omega - st_o.omega)
    ) > 0.0

    # grounded (both leg flags set): no force, counters frozen
    st_g = st.replace(leg1=jnp.array(True), leg2=jnp.array(True))
    _, st_gw, _, _, _ = step(jax.random.PRNGKey(1), st_g, jnp.int32(0), p)
    assert int(st_gw.wind_idx) == idx0
    assert int(st_gw.torque_idx) == int(st.torque_idx)
