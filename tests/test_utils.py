"""Metrics/visualization utils tests."""

import json
import os

import jax
import numpy as np

from deep_q_learning_tpu.envs import LunarLander
from deep_q_learning_tpu.models import QNetwork
from deep_q_learning_tpu.utils.metrics import MetricLogger, plot_history, stopwatch
from deep_q_learning_tpu.utils.visualize import (
    dump_trajectory,
    plot_lander_flight,
    record_trajectory,
)


def test_metric_logger_jsonl(tmp_path):
    path = os.path.join(str(tmp_path), "log", "metrics.jsonl")
    ml = MetricLogger(path)
    ml.log({"step": 1, "x": 2.0})
    ml.log({"step": 2, "x": 3.0})
    ml.close()
    lines = [json.loads(l) for l in open(path)]
    assert lines == [{"step": 1, "x": 2.0}, {"step": 2, "x": 3.0}]


def test_plot_history(tmp_path):
    hist = [
        {"env_steps": i * 100, "window_mean": float(i), "loss": 1.0 / (i + 1)}
        for i in range(10)
    ]
    p = plot_history(hist, os.path.join(str(tmp_path), "c.png"))
    assert os.path.exists(p) and os.path.getsize(p) > 1000


def test_stopwatch():
    out = []
    with stopwatch("phase", sink=out.append):
        pass
    assert len(out) == 1 and out[0].startswith("phase:")


def test_record_and_plot_trajectory(tmp_path):
    env = LunarLander()
    p = env.default_params()
    net = QNetwork(num_actions=4, hidden=(16,), dueling=False)
    params = net.init(jax.random.PRNGKey(0), np.zeros((1, 8), np.float32))
    traj = record_trajectory(env, p, net, params, jax.random.PRNGKey(1), max_steps=200)
    assert 1 <= traj["length"] <= 200
    assert traj["obs"].shape == (traj["length"], 8)
    assert np.isfinite(traj["ret"])
    # reward outside the live region is masked, return matches the sum
    np.testing.assert_allclose(traj["ret"], traj["reward"].sum(), rtol=1e-5)
    png = plot_lander_flight(traj, os.path.join(str(tmp_path), "f.png"))
    npz = dump_trajectory(os.path.join(str(tmp_path), "t.npz"), traj)
    assert os.path.getsize(png) > 1000
    loaded = np.load(npz)
    np.testing.assert_array_equal(loaded["obs"], traj["obs"])
