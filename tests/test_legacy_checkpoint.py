"""Load the reference repo's COMMITTED jax-0.3-era checkpoint and run it.

Round-1 VERDICT item 5: ``/root/reference/Test/lunar_lander/params.pickle``
is pickled with ``jax._src.device_array`` (deleted in modern jax), so a
plain ``pickle.load`` crashes.  ``_LegacyUnpickler`` + ``haiku_to_flax_params``
complete the migration story: the reference's trained artifact loads,
converts to a QNetwork param tree, and produces the SAME Q-values as the
reference's Haiku dueling algebra computed by hand from the raw weights
(``/root/reference/LunarLander/dddqn.py:26-31``).
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deep_q_learning_tpu.models import QNetwork
from deep_q_learning_tpu.utils.checkpoint import (
    haiku_to_flax_params,
    load_params_pickle,
)

REF_DIR = "/root/reference/Test/lunar_lander"


@pytest.fixture(scope="module")
def ref_params():
    if not os.path.exists(os.path.join(REF_DIR, "params.pickle")):
        pytest.skip("reference checkpoint not available")
    params, opt_state = load_params_pickle(REF_DIR)
    return params, opt_state


def test_legacy_pickle_loads_as_numpy(ref_params):
    params, opt_state = ref_params
    assert set(params) == {
        "model/~/linear",
        "model/~/linear_1",
        "model/~/linear_2",
        "model/~/linear_3",
    }
    assert params["model/~/linear"]["w"].shape == (9, 32)
    assert params["model/~/linear_1"]["w"].shape == (32, 64)
    for layer in params.values():
        for arr in layer.values():
            assert isinstance(arr, np.ndarray) and np.isfinite(arr).all()
    # adamw opt_state carries matching moment trees
    flat = jax.tree.leaves(opt_state)
    assert any(isinstance(x, np.ndarray) and x.shape == (9, 32) for x in flat)


def test_converted_params_match_haiku_algebra(ref_params):
    params, _ = ref_params
    num_actions = params["model/~/linear_3"]["w"].shape[1]
    flax_params = haiku_to_flax_params(params, hidden_layers=2)
    net = QNetwork(num_actions=num_actions, hidden=(32, 64), dueling=True)
    obs = np.random.RandomState(0).uniform(-1, 1, size=(5, 9)).astype(np.float32)
    q = np.asarray(net.apply(flax_params, jnp.asarray(obs)))

    # reference Haiku forward, straight from the raw weights (dddqn.py:26-31)
    x = obs
    x = np.maximum(x @ params["model/~/linear"]["w"] + params["model/~/linear"]["b"], 0)
    x = np.maximum(x @ params["model/~/linear_1"]["w"] + params["model/~/linear_1"]["b"], 0)
    val = x @ params["model/~/linear_2"]["w"] + params["model/~/linear_2"]["b"]
    adv = x @ params["model/~/linear_3"]["w"] + params["model/~/linear_3"]["b"]
    q_ref = val + adv - adv.mean(axis=1, keepdims=True)
    np.testing.assert_allclose(q, q_ref, rtol=1e-5, atol=1e-5)


def test_reference_checkpoint_greedy_rollout(ref_params):
    """The migrated policy runs greedy on the pure-JAX lander end to end."""
    params, _ = ref_params
    flax_params = haiku_to_flax_params(params, hidden_layers=2)
    net = QNetwork(num_actions=4, hidden=(32, 64), dueling=True)

    from deep_q_learning_tpu.envs import make_env

    env, p = make_env("LunarLander-v2", time_fraction_obs=True, max_steps_in_episode=1500)
    step = jax.jit(env.step)
    obs, st = env.reset(jax.random.PRNGKey(0), p)
    total = 0.0
    for t in range(1500):
        a = jnp.argmax(net.apply(flax_params, obs[None])[0])
        obs, st, r, term, trunc = step(jax.random.PRNGKey(t), st, a, p)
        total += float(r)
        if bool(term) or bool(trunc):
            break
    assert np.isfinite(total)
