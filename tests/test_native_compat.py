"""Native C++ replay buffer + host-compat agent tests."""

import numpy as np
import pytest

pytest.importorskip("ctypes")


def _has_gxx():
    import shutil

    return shutil.which("g++") is not None


pytestmark = pytest.mark.skipif(not _has_gxx(), reason="no C++ compiler")


def test_native_buffer_add_wrap_sample():
    from deep_q_learning_tpu.native import HostReplayBuffer

    rb = HostReplayBuffer(capacity=8, obs_dim=3, seed=0)
    assert rb.size == 0
    for t in range(11):
        rb.add(np.full(3, t, np.float32), t % 4, float(t), np.full(3, t + 0.5, np.float32), t % 5 == 0)
    assert rb.size == 8
    obs, action, reward, next_obs, done = rb.sample(256)
    assert obs.shape == (256, 3) and next_obs.shape == (256, 3)
    # wrapped: only steps 3..10 remain
    assert reward.min() >= 3 and reward.max() <= 10
    # payload consistency: obs encodes the step, next_obs = step + 0.5
    np.testing.assert_allclose(obs[:, 0], reward)
    np.testing.assert_allclose(next_obs[:, 0], reward + 0.5)
    np.testing.assert_array_equal(action, reward.astype(np.int32) % 4)
    np.testing.assert_array_equal(done, (reward.astype(int) % 5) == 0)


def test_native_buffer_batch_add_and_coverage():
    from deep_q_learning_tpu.native import HostReplayBuffer

    rb = HostReplayBuffer(capacity=64, obs_dim=2, seed=1)
    n = 32
    rb.add_batch(
        np.arange(n * 2, dtype=np.float32).reshape(n, 2),
        np.arange(n, dtype=np.int32),
        np.arange(n, dtype=np.float32),
        np.zeros((n, 2), np.float32),
        np.zeros((n,), np.uint8),
    )
    assert rb.size == n
    _, _, reward, _, _ = rb.sample(4096)
    counts = np.bincount(reward.astype(int), minlength=n)
    assert counts.min() > 60  # roughly uniform with replacement


class TinyCorridorEnv:
    """5-state corridor, classic 4-tuple Gym protocol; reward 1 at the end."""

    def __init__(self):
        self.pos = 0

    def reset(self):
        self.pos = 2
        return self._obs()

    def _obs(self):
        o = np.zeros(5, np.float32)
        o[self.pos] = 1.0
        return o

    def step(self, action):
        self.pos += 1 if action == 1 else -1
        self.pos = int(np.clip(self.pos, 0, 4))
        done = self.pos in (0, 4)
        reward = 1.0 if self.pos == 4 else (-1.0 if self.pos == 0 else -0.01)
        return self._obs(), reward, done, {}


def test_host_agent_solves_corridor():
    from deep_q_learning_tpu.config import DQNConfig
    from deep_q_learning_tpu.compat.host_loop import HostAgent

    cfg = DQNConfig(
        num_envs=1, batch_size=32, buffer_capacity=4096, training_start=64,
        double=True, dueling=False, hidden=(32,), learning_rate=3e-3,
        optimizer="adam", gamma=0.9, eps_schedule="exp_episode",
        eps_start=1.0, eps_decay=0.95, eps_min=0.01, train_every=2,
        target_replace_episodes=10, max_steps_in_episode=20,
        return_window=20, solve_threshold=0.5, seed=0,
    )
    agent = HostAgent(TinyCorridorEnv(), obs_dim=5, num_actions=2, cfg=cfg)
    solved, episodes = agent.training(max_episodes=300, verbose=False)
    assert solved, f"corridor not solved in {episodes} episodes"
    evals = agent.evaluate(5)
    assert min(evals) > 0.9  # greedy walks straight to the goal
