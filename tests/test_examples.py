"""Entry-script smoke tests (the L4 layer): run each example with a tiny
budget on CPU via monkeypatched presets."""

import dataclasses
import os
import sys

import pytest

from deep_q_learning_tpu.config import DQNConfig

TINY = DQNConfig(
    env_id="CartPole-v1", num_envs=8, steps_per_superstep=8, batch_size=16,
    training_start=32, buffer_capacity=512, double=False, dueling=False,
    hidden=(16,), train_every=1, eps_schedule="linear_step", return_window=8,
    max_steps_in_episode=50,
)


def test_train_cartpole_script(tmp_path, monkeypatch, capsys):
    import deep_q_learning_tpu.config as C
    import examples.train_cartpole as script

    monkeypatch.setattr(script, "cartpole_vector", lambda: TINY)
    monkeypatch.setattr(
        sys, "argv",
        ["x", "--steps", "128", "--workdir", os.path.join(str(tmp_path), "w")],
    )
    script.main()
    out = capsys.readouterr().out
    assert "solved=" in out
    assert os.path.exists(os.path.join(str(tmp_path), "w", "curves.png"))


def test_train_lunar_script(tmp_path, monkeypatch, capsys):
    import examples.train_lunar_lander as script

    tiny_lunar = dataclasses.replace(
        TINY, env_id="LunarLander-v2", time_fraction_obs=True,
        replay="prioritized", n_step=2,
    )
    monkeypatch.setattr(script, "PRESETS", {"lunar_per": lambda: tiny_lunar})
    monkeypatch.setattr(
        sys, "argv",
        ["x", "--steps", "128", "--rollouts", "1",
         "--workdir", os.path.join(str(tmp_path), "w")],
    )
    script.main()
    out = capsys.readouterr().out
    assert "greedy rollout returns" in out
    assert os.path.exists(os.path.join(str(tmp_path), "w", "rollout_0.png"))
    assert os.path.exists(
        os.path.join(str(tmp_path), "w", "ref_format", "params.pickle")
    )


def test_evaluate_checkpoint_script(tmp_path, monkeypatch, capsys):
    # produce a ref-format checkpoint with the tiny net, then evaluate it
    from deep_q_learning_tpu.train import Trainer
    import examples.evaluate_checkpoint as script

    cfg = dataclasses.replace(TINY, env_id="LunarLander-v2", time_fraction_obs=True)
    tr = Trainer(cfg).init()
    d = os.path.join(str(tmp_path), "ck")
    tr.save_pickle_compat(d)

    monkeypatch.setattr(script, "lunar_per", lambda: cfg)
    monkeypatch.setattr(
        sys, "argv",
        ["x", "--ckpt", d, "--episodes", "2",
         "--out", os.path.join(str(tmp_path), "out")],
    )
    script.main()
    out = capsys.readouterr().out
    assert "eval over 2 greedy episodes" in out


def test_hpo_script_importable():
    import examples.hyperparameter_search  # noqa: F401
    import examples.train_multihost  # noqa: F401


def test_population_sweep_script(tmp_path, monkeypatch, capsys):
    import examples.population_sweep as script

    monkeypatch.setattr(
        script, "PRESETS", {"cartpole_vector": lambda: TINY}
    )
    out_json = os.path.join(str(tmp_path), "sweep.json")
    monkeypatch.setattr(
        sys, "argv",
        ["x", "--members", "2", "--steps", "128", "--num-envs", "8",
         "--out", out_json],
    )
    script.main()
    assert "eval" in capsys.readouterr().out
    import json

    data = json.load(open(out_json))
    assert len(data["values"]) == 2 and len(data["eval_mean"]) == 2
