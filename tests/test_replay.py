"""Ring-buffer invariants: add/wraparound/sample — the device-side rebuild of
the reference buffer's semantics (``replay_buffer.py:35-43`` overwrite-oldest,
``:68-85`` uniform-with-replacement sampling)."""

import jax
import jax.numpy as jnp
import numpy as np

from deep_q_learning_tpu.envs.base import Transition
from deep_q_learning_tpu.replay import UniformReplay


def make_transition(num_envs, step_value):
    """Batched transition whose payload encodes (env_idx, step) for checking."""
    base = jnp.arange(num_envs, dtype=jnp.float32)
    return Transition(
        obs=jnp.stack([base, jnp.full((num_envs,), float(step_value))], axis=1),
        action=jnp.full((num_envs,), step_value % 4, jnp.int32),
        reward=jnp.full((num_envs,), float(step_value), jnp.float32),
        next_obs=jnp.zeros((num_envs, 2), jnp.float32),
        terminated=jnp.zeros((num_envs,), bool),
        truncated=jnp.zeros((num_envs,), bool),
    )


def test_add_and_wraparound():
    replay = UniformReplay(num_envs=4, capacity_per_env=8)
    state = replay.init(make_transition(4, 0))
    add = jax.jit(replay.add)
    for t in range(11):  # 3 past capacity -> wraps
        state = add(state, make_transition(4, t))
    assert int(state.cursor) == 11 % 8
    assert int(state.filled) == 8
    # slot 0..2 were overwritten by steps 8..10; slots 3..7 hold steps 3..7
    from deep_q_learning_tpu.replay.uniform import AUX_REWARD

    rewards = np.asarray(state.storage.aux[..., AUX_REWARD])  # (C, N)
    for slot in range(8):
        expect = slot + 8 if slot < 3 else slot
        assert (rewards[slot] == expect).all()


def test_sample_returns_stored_transitions():
    replay = UniformReplay(num_envs=4, capacity_per_env=8)
    state = replay.init(make_transition(4, 0))
    for t in range(5):
        state = replay.add(state, make_transition(4, t))
    batch = jax.jit(lambda s, k: replay.sample(s, k, 64))(state, jax.random.PRNGKey(0))
    obs = np.asarray(batch.obs)
    # every sampled obs must encode a valid (env, step) pair with step < filled
    assert ((obs[:, 0] >= 0) & (obs[:, 0] < 4)).all()
    assert ((obs[:, 1] >= 0) & (obs[:, 1] < 5)).all()  # only filled slots
    # reward must match the step encoded in obs
    np.testing.assert_array_equal(np.asarray(batch.reward), obs[:, 1])


def test_sample_uniform_coverage():
    replay = UniformReplay(num_envs=2, capacity_per_env=16)
    state = replay.init(make_transition(2, 0))
    for t in range(16):
        state = replay.add(state, make_transition(2, t))
    batch = replay.sample(state, jax.random.PRNGKey(1), 4096)
    steps = np.asarray(batch.reward).astype(int)
    counts = np.bincount(steps, minlength=16)
    # with-replacement uniform over 32 cells: each of 16 steps ~256 draws
    assert counts.min() > 150 and counts.max() < 400


def test_can_sample_gate():
    replay = UniformReplay(num_envs=4, capacity_per_env=8)
    state = replay.init(make_transition(4, 0))
    assert not bool(replay.can_sample(state, 8))
    state = replay.add(state, make_transition(4, 0))
    # 4 transitions stored (1 slot x 4 envs)
    assert bool(replay.can_sample(state, 4))
    assert not bool(replay.can_sample(state, 5))
    state = replay.add(state, make_transition(4, 1))
    assert bool(replay.can_sample(state, 8))
