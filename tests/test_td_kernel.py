"""Pallas fused TD+huber kernel vs the jnp reference path (interpret mode on
CPU; the same kernel compiles for TPU — exercised by bench/probe runs)."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deep_q_learning_tpu.replay.nstep import LearnBatch
from deep_q_learning_tpu.algos.losses import build_loss_fn
from deep_q_learning_tpu.ops.td_kernels import build_pallas_loss_fn


def _linear_apply(params, x):
    return x @ params["w"] + params["b"]


def _make(key, b=64, d=6, a=4, gamma=0.93):
    ks = jax.random.split(key, 9)
    terminated = jax.random.bernoulli(ks[4], 0.3, (b,))
    batch = LearnBatch(
        obs=jax.random.normal(ks[0], (b, d)),
        action=jax.random.randint(ks[1], (b,), 0, a),
        reward=jax.random.normal(ks[2], (b,)),
        next_obs=jax.random.normal(ks[3], (b, d)),
        bootstrap=gamma * (1.0 - terminated.astype(jnp.float32)),
    )
    params = {"w": jax.random.normal(ks[5], (d, a)), "b": jax.random.normal(ks[6], (a,))}
    target = {"w": jax.random.normal(ks[7], (d, a)), "b": jnp.zeros((a,))}
    weights = jnp.abs(jax.random.normal(ks[6], (b,))) + 0.1
    return params, target, batch, weights


@pytest.mark.parametrize("double", [True, False])
def test_loss_and_td_match_jnp(double):
    params, target, batch, weights = _make(jax.random.PRNGKey(0))
    ref = build_loss_fn(_linear_apply, double=double, loss="huber", huber_delta=1.0)
    pal = build_pallas_loss_fn(_linear_apply, double=double, huber_delta=1.0, interpret=True)
    l_ref, td_ref = ref(params, target, batch, weights)
    l_pal, td_pal = pal(params, target, batch, weights)
    np.testing.assert_allclose(float(l_ref), float(l_pal), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(td_ref), np.asarray(td_pal), rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("double", [True, False])
def test_gradients_match_jnp(double):
    params, target, batch, weights = _make(jax.random.PRNGKey(1))
    ref = build_loss_fn(_linear_apply, double=double)
    pal = build_pallas_loss_fn(_linear_apply, double=double, interpret=True)
    g_ref = jax.grad(lambda p: ref(p, target, batch, weights)[0])(params)
    g_pal = jax.grad(lambda p: pal(p, target, batch, weights)[0])(params)
    np.testing.assert_allclose(
        np.asarray(g_ref["w"]), np.asarray(g_pal["w"]), rtol=1e-4, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(g_ref["b"]), np.asarray(g_pal["b"]), rtol=1e-4, atol=1e-6
    )


def test_huber_clipping_in_backward():
    """Gradient magnitude saturates at delta per unit weight."""
    params, target, batch, weights = _make(jax.random.PRNGKey(2))
    batch = batch.replace(reward=batch.reward + 100.0)  # huge td errors
    pal = build_pallas_loss_fn(_linear_apply, huber_delta=1.0, interpret=True)
    _, td = pal(params, target, batch, weights)
    assert float(jnp.min(jnp.abs(td))) > 1.0  # all in the linear regime
    g = jax.grad(lambda p: pal(p, target, batch, weights)[0])(params)
    # in the linear regime d/dq = -w*delta/B at taken actions: bounded
    b = batch.obs.shape[0]
    bound = float(jnp.max(weights)) / b * 1.0 + 1e-6
    # project gradient back through the linear layer is complex; check the
    # direct dq bound via jacobian on q_s instead:
    from deep_q_learning_tpu.ops.td_kernels import fused_td_loss

    q_s = _linear_apply(params, batch.obs)
    q_no = _linear_apply(params, batch.next_obs)
    q_nt = _linear_apply(target, batch.next_obs)
    dq = jax.grad(
        lambda q: fused_td_loss(
            q, q_no, q_nt, batch.action, batch.reward, batch.bootstrap,
            weights, 1.0, True, True,
        )[0]
    )(q_s)
    assert float(jnp.max(jnp.abs(dq))) <= bound


def test_superstep_with_pallas_path_interpret():
    """cfg.use_pallas routes the learner through the kernel (interpreted on
    CPU); the superstep must still run and produce finite losses."""
    from deep_q_learning_tpu.config import DQNConfig
    from deep_q_learning_tpu.train import Trainer

    cfg = DQNConfig(
        env_id="CartPole-v1",
        num_envs=8,
        steps_per_superstep=8,
        batch_size=16,
        training_start=16,
        buffer_capacity=512,
        double=True,
        dueling=True,
        hidden=(16,),
        train_every=1,
        eps_schedule="linear_step",
        return_window=8,
        use_pallas=True,
    )
    tr = Trainer(cfg).init()
    res = tr.train(max_env_steps=256, log_every=1, verbose=False)
    assert np.isfinite(res.history[-1]["loss"])


def test_pallas_config_validation():
    import dataclasses

    from deep_q_learning_tpu.config import DQNConfig
    from deep_q_learning_tpu.algos import build_update_step, make_optimizer

    cfg = DQNConfig(use_pallas=True, loss="mse")
    with pytest.raises(ValueError):
        build_update_step(lambda p, x: x, make_optimizer(cfg), cfg)
    cfg2 = DQNConfig(use_pallas=True, ref_terminal_quirk=True)
    with pytest.raises(ValueError):
        build_update_step(lambda p, x: x, make_optimizer(cfg2), cfg2)
