"""Q-network tests: dueling-head algebra (ref ``dddqn.py:29-31``), feature
output, and bf16 compute path."""

import jax
import jax.numpy as jnp
import numpy as np

from deep_q_learning_tpu.models import QNetwork


def test_dueling_head_algebra():
    """Q = V + A - mean(A) implies mean_a(Q) == V: check via the params."""
    net = QNetwork(num_actions=4, hidden=(8, 8), dueling=True)
    params = net.init(jax.random.PRNGKey(0), jnp.zeros((2, 5)))
    x = jax.random.normal(jax.random.PRNGKey(1), (7, 5))
    q, feats = net.apply(params, x, return_features=True)
    assert q.shape == (7, 4) and feats.shape == (7, 8)
    # reconstruct V from the value head directly
    v = feats @ params["params"]["value"]["kernel"] + params["params"]["value"]["bias"]
    np.testing.assert_allclose(
        np.asarray(jnp.mean(q, axis=1)), np.asarray(v[:, 0]), rtol=1e-5, atol=1e-6
    )


def test_non_dueling_head():
    net = QNetwork(num_actions=3, hidden=(8,), dueling=False)
    params = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 4)))
    q = net.apply(params, jnp.ones((5, 4)))
    assert q.shape == (5, 3)
    assert q.dtype == jnp.float32


def test_bf16_compute_dtype_outputs_f32():
    net = QNetwork(num_actions=4, hidden=(16, 16), compute_dtype=jnp.bfloat16)
    params = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 8)))
    q = net.apply(params, jax.random.normal(jax.random.PRNGKey(1), (3, 8)))
    assert q.dtype == jnp.float32
    # close to the f32 computation
    net32 = QNetwork(num_actions=4, hidden=(16, 16), compute_dtype=jnp.float32)
    q32 = net32.apply(params, jax.random.normal(jax.random.PRNGKey(1), (3, 8)))
    np.testing.assert_allclose(np.asarray(q), np.asarray(q32), rtol=0.05, atol=0.05)
