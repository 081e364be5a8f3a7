"""Cross-validation harness against Gym's reference environments.

BASELINE.json asks for trajectory fidelity of the pure-JAX envs; round-1
VERDICT.md item 1 asks for *measured* step-level divergence against the real
Box2D LunarLander rather than self-referential claims.  This module produces
those numbers (persisted to ``artifacts/gym_parity.json`` by
``examples/gym_parity_report.py``):

* ``compare_cartpole`` — step Gym's CartPole and ours with the same actions
  from the same state; the dynamics are the same closed-form equations, so
  divergence is float noise.

* ``compare_lunar_stepwise`` — the real fidelity instrument.  Resets the
  Box2D env, *injects* its exact post-reset rigid-body state (position,
  velocity, angle, angular velocity) and terrain into the JAX env's state
  pytree, then steps both with the same action sequence and reports
  per-step observation divergence.  Engine dispersion noise is drawn from
  different RNGs on the two sides, so for engine-on comparisons it is
  zeroed on both (gym: an RNG proxy that nulls the per-step ±1/SCALE
  draws; JAX: ``dispersion_scale=0``).  Free flight should match to float
  tolerance (same integrator, same impulse geometry, measured mass/
  inertia); contact diverges by design (block-solver point contacts vs
  Box2D's 3-body jointed assembly) — the number quantifies how much.

* ``compare_lunar_task_level`` — heuristic-controller return/landing-rate
  distributions on both engines (same controller formula as gymnasium's
  ``heuristic``), plus impact-speed crash boundaries.

Reference task: ``/root/reference/Test/lunar_lander.py:44`` trains on Gym's
``LunarLander-v2``; gymnasium's ``LunarLander-v3`` is the maintained
registration of the same task.
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np


def _import_gym():
    try:
        import gymnasium as gym

        return gym, 5
    except ImportError:
        pass
    try:
        import gym  # classic API

        return gym, 4
    except ImportError:
        return None, 0


def _make_lander(gym, **kwargs):
    for env_id in ("LunarLander-v3", "LunarLander-v2"):
        try:
            return gym.make(env_id, **kwargs).unwrapped
        except Exception:
            continue
    raise RuntimeError("no LunarLander registration available")


class _ZeroDispersionRNG:
    """np_random proxy nulling the lander's per-step dispersion draws.

    gymnasium's step draws ``uniform(-1.0, +1.0)`` (scalar) twice per frame
    for engine dispersion; terrain (vector draw) and the initial force
    (``uniform(-1000, 1000)``) have distinguishable signatures and pass
    through to the real generator.
    """

    def __init__(self, rng):
        self._rng = rng

    def uniform(self, low=0.0, high=1.0, size=None):
        if size is None and low == -1.0 and high == 1.0:
            return 0.0
        return self._rng.uniform(low, high, size)

    def __getattr__(self, name):
        return getattr(self._rng, name)


def _shaping_of(obs) -> float:
    o = np.asarray(obs, np.float64)
    return float(
        -100 * np.sqrt(o[0] ** 2 + o[1] ** 2)
        - 100 * np.sqrt(o[2] ** 2 + o[3] ** 2)
        - 100 * abs(o[4])
        + 10 * o[6]
        + 10 * o[7]
    )


def _inject_state_from_gym(genv, jax_env, params):
    """Build a JAX LunarLanderState mirroring the Box2D env's current pose."""
    import jax.numpy as jnp

    from deep_q_learning_tpu.envs.lunar_lander import CHUNKS, LunarLanderState
    from deep_q_learning_tpu.envs.lander_solver import Body, zero_acc

    L = genv.lander
    # terrain surface heights: sky_polys[i][0] = (chunk_x[i], smooth_y[i])
    smooth_y = [genv.sky_polys[i][0][1] for i in range(CHUNKS - 1)]
    smooth_y.append(genv.sky_polys[-1][1][1])  # right endpoint
    terrain = jnp.asarray(np.asarray(smooth_y, np.float32))

    def leg_body(gleg):
        # leg localCenter is (0,0): body origin == COM, as Body expects
        return Body(
            cx=jnp.float32(gleg.position.x),
            cy=jnp.float32(gleg.position.y),
            a=jnp.float32(gleg.angle),
            vx=jnp.float32(gleg.linearVelocity.x),
            vy=jnp.float32(gleg.linearVelocity.y),
            w=jnp.float32(gleg.angularVelocity),
        )

    # gym creates legs for i in [-1, +1]; lander_solver's leg1 is side -1
    jointed = getattr(params, "jointed", False)
    state = LunarLanderState(
        leg1_body=leg_body(genv.legs[0]) if jointed else None,
        leg2_body=leg_body(genv.legs[1]) if jointed else None,
        # Box2D's accumulators are not readable through pybox2d; starting
        # from zero costs one settling frame at the (airborne) injection
        # point, where only the tiny motor/limit impulses are in play.
        solver_acc=zero_acc() if jointed else None,
        x=jnp.float32(L.position.x),
        y=jnp.float32(L.position.y),
        vx=jnp.float32(L.linearVelocity.x),
        vy=jnp.float32(L.linearVelocity.y),
        angle=jnp.float32(L.angle),
        omega=jnp.float32(L.angularVelocity),
        leg1=jnp.array(bool(genv.legs[0].ground_contact)),
        leg2=jnp.array(bool(genv.legs[1].ground_contact)),
        terrain=terrain,
        prev_shaping=jnp.float32(genv.prev_shaping),
        t=jnp.int32(0),
        sleep=jnp.int32(0),
        # gymnasium v3 draws both pattern offsets at reset (lunar_lander.py
        # :323-325 in gymnasium 1.2.2); mirror them so the deterministic
        # tanh(sin) pattern is phase-matched for wind comparisons
        wind_idx=jnp.int32(getattr(genv, "wind_idx", 0)),
        torque_idx=jnp.int32(getattr(genv, "torque_idx", 0)),
    )
    return state


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


def compare_classic(env_id: str, num_steps: int = 300, seed: int = 0) -> Optional[dict]:
    """Acrobot/MountainCar stepwise cross-validation against gymnasium
    (VERDICT r2 item 10): matched initial state, same action sequence,
    max per-dimension observation divergence."""
    gym, api = _import_gym()
    if gym is None:
        return None
    import jax
    import jax.numpy as jnp

    from deep_q_learning_tpu.envs import make_env

    genv = gym.make(env_id).unwrapped
    out = genv.reset(seed=seed)
    gobs = np.asarray(out[0] if isinstance(out, tuple) else out, np.float32)

    # gym is .unwrapped (no TimeLimit), so the JAX env's own step cap must
    # not fire mid-comparison either — this measures dynamics + termination,
    # not time-limit bookkeeping
    env, p = make_env(env_id, max_steps_in_episode=num_steps + 1)
    _, state = env.reset(jax.random.PRNGKey(0), p)
    if env_id == "Acrobot-v1":
        # gym state: [theta1, theta2, dtheta1, dtheta2]
        s = np.asarray(genv.state, np.float64)
        state = state.replace(
            theta1=jnp.float32(s[0]),
            theta2=jnp.float32(s[1]),
            dtheta1=jnp.float32(s[2]),
            dtheta2=jnp.float32(s[3]),
        )
    elif env_id == "MountainCar-v0":
        s = np.asarray(genv.state, np.float64)
        state = state.replace(
            position=jnp.float32(s[0]), velocity=jnp.float32(s[1])
        )
    else:
        raise ValueError(env_id)
    num_actions = env.num_actions
    step = jax.jit(env.step)
    rng = np.random.RandomState(seed)
    max_err = 0.0
    steps = 0
    term_match = True
    for t in range(num_steps):
        a = int(rng.randint(num_actions))
        gout = genv.step(a)
        gobs = np.asarray(gout[0], np.float32)
        gterm = bool(gout[2])
        gtrunc = api == 5 and bool(gout[3])
        jobs, state, _, jterm, jtrunc = step(
            jax.random.PRNGKey(t), state, jnp.int32(a), p
        )
        max_err = max(max_err, float(np.max(np.abs(np.asarray(jobs) - gobs))))
        steps = t + 1
        # either side ending the episode (terminated OR truncated) stops the
        # comparison; terminations and truncations are matched separately so
        # a truncation is never misreported as a termination mismatch
        # (ADVICE r3: a truncated-but-not-terminated JAX env was previously
        # kept being stepped, and any truncation flagged term_match=False)
        if gterm or gtrunc or bool(jterm) or bool(jtrunc):
            term_match = (gterm == bool(jterm)) and (gtrunc == bool(jtrunc))
            break
    return {
        "env_id": env_id,
        "seed": seed,
        "steps_compared": steps,
        "max_abs_err": max_err,
        "termination_agrees": term_match,
    }


def compare_lunar_stepwise(
    policy: str = "nop",
    seed: int = 0,
    max_steps: int = 400,
    zero_dispersion: bool = True,
    closed_loop: bool = False,
    enable_wind: bool = False,
    wind_power: float = 15.0,
    turbulence_power: float = 1.5,
) -> Optional[dict]:
    """Matched-initial-state, same-action-sequence divergence measurement.

    ``policy``: "nop" (ballistic drop to touchdown), "heuristic" (the
    landing controller, actions computed from the GYM observation and
    replayed open-loop into the JAX env), or "burn" (main engine every
    frame — pure in-flight engine-model check).

    ``closed_loop=True`` gives each engine its own heuristic feedback
    (actions from its own observation).  Open-loop replay of a 200-frame
    POWERED flight amplifies any per-step difference exponentially (the
    thrust-attitude loop is unstable), so it measures chaos, not engine
    error; the closed-loop controller contracts differences instead, making
    terminal outcome and timing comparable.

    ``enable_wind=True`` (VERDICT r4 missing #3) turns on gymnasium v3's
    wind/turbulence on BOTH engines.  The pattern is the deterministic
    ``tanh(sin(0.02 i) + sin(0.01 pi i))`` indexed by counters drawn at
    reset, so with the counters injected (``_inject_state_from_gym``) a
    matched-state comparison stays exact — this validates the force
    magnitude, the airborne gating, and the per-step counter advance.

    Returns per-step divergence checkpoints, first-contact and termination
    steps on both engines, and the step at which divergence first exceeds
    1e-3 / 1e-2 in any observation dimension.
    """
    gym, api = _import_gym()
    if gym is None:
        return None
    import jax
    import jax.numpy as jnp

    from deep_q_learning_tpu.envs import LunarLander, heuristic_action

    wind_kw = (
        dict(enable_wind=True, wind_power=wind_power,
             turbulence_power=turbulence_power)
        if enable_wind
        else {}
    )
    genv = _make_lander(gym, **wind_kw)
    gobs, _ = genv.reset(seed=seed)
    if zero_dispersion:
        genv._np_random = _ZeroDispersionRNG(genv.np_random)

    env = LunarLander()
    params = env.default_params()
    if zero_dispersion:
        params = params.replace(dispersion_scale=0.0)
    if enable_wind:
        params = params.replace(
            enable_wind=True, wind_power=wind_power,
            turbulence_power=turbulence_power,
        )
    state = _inject_state_from_gym(genv, env, params)
    jobs = np.asarray(env.get_obs(state, params))
    step = jax.jit(env.step)

    init_err = float(np.max(np.abs(jobs - np.asarray(gobs, np.float32))))
    errs: List[float] = []  # continuous dims 0..5 (positions/velocities/attitude)
    rerrs: List[float] = []
    flag_match: List[bool] = []
    g_first_contact = j_first_contact = None
    g_term_step = j_term_step = None
    g_term_reward = j_term_reward = None
    gdone = jdone = False
    for t in range(max_steps):
        if policy == "nop":
            a = ja = 0
        elif policy == "burn":
            a = ja = 2
        else:
            a = int(heuristic_action(jnp.asarray(np.asarray(gobs, np.float32))))
            ja = (
                int(heuristic_action(jnp.asarray(np.asarray(jobs, np.float32))))
                if closed_loop
                else a
            )
        if not gdone:
            gobs_, gr, gterm, gtrunc, _ = genv.step(a)
            gobs = np.asarray(gobs_, np.float32)
            if g_first_contact is None and (gobs[6] > 0 or gobs[7] > 0):
                g_first_contact = t + 1
            if gterm or gtrunc:
                gdone, g_term_step, g_term_reward = True, t + 1, float(gr)
        if not jdone:
            jobs_, state, jr, jterm, jtrunc = step(
                jax.random.PRNGKey(t), state, jnp.int32(ja), params
            )
            jobs = np.asarray(jobs_)
            if j_first_contact is None and (jobs[6] > 0 or jobs[7] > 0):
                j_first_contact = t + 1
            if bool(jterm) or bool(jtrunc):
                jdone, j_term_step, j_term_reward = True, t + 1, float(jr)
        if gdone and jdone:
            break
        if gdone or jdone:
            continue  # keep stepping the live engine for its terminal info
        errs.append(float(np.max(np.abs(jobs[:6] - gobs[:6]))))
        flag_match.append(bool((jobs[6] > 0) == (gobs[6] > 0) and (jobs[7] > 0) == (gobs[7] > 0)))
        rerrs.append(abs(float(jr) - float(gr)))

    contact = min(
        [c for c in (g_first_contact, j_first_contact) if c is not None],
        default=None,
    )
    flight_n = (contact - 1) if contact is not None else len(errs)
    flight_errs = errs[:flight_n]

    def at(k):
        return errs[k - 1] if len(errs) >= k else None

    return {
        "policy": policy,
        "seed": seed,
        "zero_dispersion": zero_dispersion,
        "closed_loop": closed_loop,
        "enable_wind": enable_wind,
        "init_state_err": init_err,
        "steps_compared": len(errs),
        "flight_steps": len(flight_errs),
        "flight_max_err": max(flight_errs) if flight_errs else None,
        "obs_err_at": {
            str(k): at(k) for k in (1, 5, 10, 25, 50, 100, 200) if at(k) is not None
        },
        "max_obs_err": max(errs) if errs else None,
        "max_reward_err": max(rerrs) if rerrs else None,
        "leg_flag_agreement": float(np.mean(flag_match)) if flag_match else None,
        "first_contact": {"gym": g_first_contact, "jax": j_first_contact},
        "term_step": {"gym": g_term_step, "jax": j_term_step},
        "term_reward": {"gym": g_term_reward, "jax": j_term_reward},
    }


def compare_lunar_task_level(episodes: int = 10, seed: int = 0) -> Optional[dict]:
    """Heuristic-controller closed-loop returns on both engines."""
    gym, api = _import_gym()
    if gym is None:
        return None
    import jax
    import jax.numpy as jnp

    from deep_q_learning_tpu.envs import LunarLander, heuristic_action

    genv = _make_lander(gym)
    g_rets, g_lens = [], []
    for ep in range(episodes):
        out = genv.reset(seed=seed + ep)
        obs = np.asarray(out[0] if isinstance(out, tuple) else out, np.float32)
        total, steps = 0.0, 0
        for _ in range(1000):
            a = int(heuristic_action(jnp.asarray(obs)))
            gout = genv.step(a)
            obs = np.asarray(gout[0], np.float32)
            total += float(gout[1])
            steps += 1
            if bool(gout[2]) or bool(gout[3]):
                break
        g_rets.append(total)
        g_lens.append(steps)

    env = LunarLander()
    p = env.default_params()
    step = jax.jit(env.step)
    j_rets, j_lens = [], []
    for ep in range(episodes):
        obs, st = env.reset(jax.random.PRNGKey(seed + ep), p)
        total, steps = 0.0, 0
        for t in range(1000):
            a = heuristic_action(obs)
            obs, st, r, term, trunc = step(jax.random.PRNGKey(ep * 7919 + t), st, a, p)
            total += float(r)
            steps += 1
            if bool(term) or bool(trunc):
                break
        j_rets.append(total)
        j_lens.append(steps)

    return {
        "episodes": episodes,
        "gym": {
            "mean_return": float(np.mean(g_rets)),
            "std_return": float(np.std(g_rets)),
            "land_rate": float(np.mean([r > 200 for r in g_rets])),
            "mean_len": float(np.mean(g_lens)),
            "returns": [round(r, 1) for r in g_rets],
        },
        "jax": {
            "mean_return": float(np.mean(j_rets)),
            "std_return": float(np.std(j_rets)),
            "land_rate": float(np.mean([r > 200 for r in j_rets])),
            "mean_len": float(np.mean(j_lens)),
            "returns": [round(r, 1) for r in j_rets],
        },
    }


if __name__ == "__main__":
    print("cartpole:", compare_cartpole())
    for pol in ("nop", "burn", "heuristic"):
        print(f"lunar stepwise [{pol}]:", compare_lunar_stepwise(policy=pol))
    print("lunar task-level:", compare_lunar_task_level())
