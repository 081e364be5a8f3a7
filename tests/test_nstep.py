"""n-step return assembly tests (replay/nstep.py) against a hand-rolled
host-side computation, including episode boundaries, truncation bootstrap,
cursor-crossing validity, and integration through both buffers."""

import jax
import jax.numpy as jnp
import numpy as np

from deep_q_learning_tpu.envs.base import Transition
from deep_q_learning_tpu.replay import UniformReplay, PrioritizedReplay
from deep_q_learning_tpu.replay.nstep import (
    assemble_learn_batch,
    valid_slot_mask,
)


def _storage(rewards, terms, truncs, obs_val=None):
    """Single-env storage with scripted rewards/flags; obs encodes slot id."""
    (c,) = rewards.shape
    slots = np.arange(c, dtype=np.float32)
    obs = np.stack([slots, np.zeros(c)], axis=1)
    next_obs = np.stack([slots + 0.5, np.zeros(c)], axis=1)
    from deep_q_learning_tpu.replay.uniform import RingStorage

    aux = np.stack(  # packed lanes: [reward, action, term, trunc]
        [rewards, np.zeros(c), terms.astype(np.float32),
         truncs.astype(np.float32)], axis=1,
    ).astype(np.float32)
    return RingStorage(  # slot-major: leaves (capacity, num_envs, ...)
        obs=jnp.asarray(obs)[:, None],
        next_obs=jnp.asarray(next_obs)[:, None],
        aux=jnp.asarray(aux)[:, None],
    )


def test_three_step_return_no_boundary():
    r = np.array([1.0, 2.0, 4.0, 8.0, 16.0], np.float32)
    st = _storage(r, np.zeros(5, bool), np.zeros(5, bool))
    batch = assemble_learn_batch(
        st, jnp.array([0]), jnp.array([1]), gamma=0.5, n_step=3,
        truncation_bootstrap=True,
    )
    # G = r1 + 0.5 r2 + 0.25 r3 = 2 + 2 + 2 = 6; bootstrap = 0.5^3
    np.testing.assert_allclose(float(batch.reward[0]), 2 + 0.5 * 4 + 0.25 * 8)
    np.testing.assert_allclose(float(batch.bootstrap[0]), 0.125)
    # bootstraps from next_obs of slot 3 (= slot id + 0.5)
    np.testing.assert_allclose(float(batch.next_obs[0, 0]), 3.5)
    np.testing.assert_allclose(float(batch.obs[0, 0]), 1.0)


def test_window_stops_at_termination():
    r = np.array([1.0, 2.0, 4.0, 8.0, 16.0], np.float32)
    terms = np.array([False, False, True, False, False])
    st = _storage(r, terms, np.zeros(5, bool))
    batch = assemble_learn_batch(
        st, jnp.array([0]), jnp.array([1]), gamma=0.5, n_step=3,
        truncation_bootstrap=True,
    )
    # window [1,2,3] stops at slot 2 (terminated): G = 2 + 0.5*4, K=2
    np.testing.assert_allclose(float(batch.reward[0]), 2 + 0.5 * 4)
    np.testing.assert_allclose(float(batch.bootstrap[0]), 0.0)  # true terminal
    np.testing.assert_allclose(float(batch.next_obs[0, 0]), 2.5)  # slot 2's s'


def test_truncation_bootstraps_with_gamma_k():
    r = np.array([1.0, 2.0, 4.0, 8.0, 16.0], np.float32)
    truncs = np.array([False, False, True, False, False])
    st = _storage(r, np.zeros(5, bool), truncs)
    batch = assemble_learn_batch(
        st, jnp.array([0]), jnp.array([1]), gamma=0.5, n_step=3,
        truncation_bootstrap=True,
    )
    # stops at truncation but STILL bootstraps: K=2 -> gamma^2
    np.testing.assert_allclose(float(batch.reward[0]), 2 + 0.5 * 4)
    np.testing.assert_allclose(float(batch.bootstrap[0]), 0.25)
    # ref-compat: truncation cuts the bootstrap
    batch_ref = assemble_learn_batch(
        st, jnp.array([0]), jnp.array([1]), gamma=0.5, n_step=3,
        truncation_bootstrap=False,
    )
    np.testing.assert_allclose(float(batch_ref.bootstrap[0]), 0.0)


def test_one_step_reduces_to_classic():
    r = np.array([1.0, 2.0, 4.0], np.float32)
    terms = np.array([False, True, False])
    st = _storage(r, terms, np.zeros(3, bool))
    batch = assemble_learn_batch(
        st, jnp.array([0, 0]), jnp.array([0, 1]), gamma=0.9, n_step=1,
        truncation_bootstrap=True,
    )
    np.testing.assert_allclose(np.asarray(batch.reward), [1.0, 2.0])
    np.testing.assert_allclose(np.asarray(batch.bootstrap), [0.9, 0.0])


def test_valid_slot_mask_wraparound():
    # capacity 8, cursor 3, filled 8 (full ring): newest slots are 0,1,2
    mask = np.asarray(valid_slot_mask(8, jnp.int32(3), jnp.int32(8), n_step=3))
    # start = (3-8)%8 = 3; ranks of slots: slot3->0 ... slot2->7
    # valid ranks < 8-2=6 -> ranks 0..5 -> slots 3,4,5,6,7,0; newest (1,2) invalid
    expect = np.array([True, False, False, True, True, True, True, True])
    np.testing.assert_array_equal(mask, expect)


def _fill_buffer(replay, steps):
    state = replay.init(
        Transition(
            obs=jnp.zeros((replay.num_envs, 2), jnp.float32),
            action=jnp.zeros((replay.num_envs,), jnp.int32),
            reward=jnp.zeros((replay.num_envs,), jnp.float32),
            next_obs=jnp.zeros((replay.num_envs, 2), jnp.float32),
            terminated=jnp.zeros((replay.num_envs,), bool),
            truncated=jnp.zeros((replay.num_envs,), bool),
        )
    )
    for t in range(steps):
        tr = Transition(
            obs=jnp.full((replay.num_envs, 2), float(t)),
            action=jnp.zeros((replay.num_envs,), jnp.int32),
            reward=jnp.full((replay.num_envs,), float(t)),
            next_obs=jnp.full((replay.num_envs, 2), float(t) + 0.5),
            terminated=jnp.zeros((replay.num_envs,), bool),
            truncated=jnp.zeros((replay.num_envs,), bool),
        )
        state = replay.add(state, tr)
    return state


def test_uniform_nstep_windows_stay_in_time_order():
    replay = UniformReplay(2, 8, gamma=1.0, n_step=3)
    state = _fill_buffer(replay, 13)  # wrapped: slots hold steps 5..12
    batch, _, _ = replay.sample_with_info(state, jax.random.PRNGKey(0), 256)
    # with gamma=1 and r_t = t, a valid 3-window starting at step t sums
    # t + (t+1) + (t+2) = 3t+3; windows must never mix eras
    start_steps = np.asarray(batch.obs[:, 0])
    np.testing.assert_allclose(np.asarray(batch.reward), 3 * start_steps + 3)
    assert start_steps.max() <= 10  # newest valid start is step 10 (10,11,12)
    assert start_steps.min() >= 5


def test_per_nstep_masks_newest_slots():
    replay = PrioritizedReplay(2, 8, alpha=1.0, gamma=1.0, n_step=3)
    state = _fill_buffer(replay, 13)
    batch, info, _ = replay.sample_with_info(state, jax.random.PRNGKey(0), 256)
    start_steps = np.asarray(batch.obs[:, 0])
    np.testing.assert_allclose(np.asarray(batch.reward), 3 * start_steps + 3)
    assert start_steps.max() <= 10


def test_nstep_training_learns_cartpole():
    """n-step=3 end-to-end smoke: must learn at least as a sanity gate."""
    from deep_q_learning_tpu.config import DQNConfig
    from deep_q_learning_tpu.train import Trainer

    cfg = DQNConfig(
        env_id="CartPole-v1", num_envs=32, steps_per_superstep=64,
        batch_size=128, training_start=1000, buffer_capacity=50_000,
        n_step=3, double=False, dueling=False, hidden=(64, 64),
        learning_rate=5e-4, eps_schedule="linear_step", eps_decay_steps=30_000,
        eps_min=0.05, train_every=1, target_sync_mode="steps",
        target_sync_every=512, return_window=32,
    )
    tr = Trainer(cfg).init()
    res = tr.train(max_env_steps=80_000, log_every=5, verbose=False)
    best = max(r["window_mean"] for r in res.history)
    assert best > 50.0, f"n-step training shows no learning: best {best}"
