"""Standing Box2D cross-validation gates (round-1 VERDICT item 1).

These run only when gymnasium + Box2D are importable (they are in the build
image).  The gates encode the measured fidelity contract of
``envs/lunar_lander.py``:

* matched-initial-state free flight tracks Box2D to ~1e-2 observation units
  over >=40 frames (the residual is the leg-swing momentum the single-rigid-
  body model folds into the hull — see the env module docstring);
* the heuristic controller lands with +100 on both engines at comparable
  rates and episode lengths;
* vertical-impact crash boundaries agree (land <=1.5 m/s, crash >=2.5 m/s,
  chaotic between on Box2D).
"""

import numpy as np
import pytest

gym = pytest.importorskip("gymnasium")
pytest.importorskip("Box2D")

from deep_q_learning_tpu.envs import gym_compat as gc  # noqa: E402


def test_lunar_flight_stepwise_divergence():
    res = gc.compare_lunar_stepwise(policy="burn", seed=0)
    assert res["init_state_err"] < 1e-5, res  # state injection is exact
    assert res["flight_steps"] >= 40, res
    assert res["flight_max_err"] < 0.05, res
    # the engine model itself: one full-thrust frame from a matched state
    assert res["obs_err_at"]["1"] < 5e-3, res


def test_lunar_ballistic_contact_timing():
    res = gc.compare_lunar_stepwise(policy="nop", seed=0)
    # both engines reach first ground contact within a few frames of each other
    g, j = res["first_contact"]["gym"], res["first_contact"]["jax"]
    assert g is not None and j is not None
    assert abs(g - j) <= 5, res


def test_lunar_task_level_parity():
    res = gc.compare_lunar_task_level(episodes=6, seed=0)
    assert res["gym"]["mean_return"] > 100, res
    assert res["jax"]["mean_return"] > 100, res
    # same controller, same success band on both engines
    assert res["jax"]["land_rate"] >= res["gym"]["land_rate"] - 0.35, res
    assert abs(res["jax"]["mean_len"] - res["gym"]["mean_len"]) < 150, res
