"""AOT executable cache tests (utils/aot.py) — CPU backend.

The cache exists for the remote TPU backend (which ignores jax's persistent
compilation cache; CLAUDE.md), but the serialize/deserialize roundtrip and
the Trainer wiring are backend-generic and exercised here on CPU.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np

from deep_q_learning_tpu.config import DQNConfig
from deep_q_learning_tpu.train import Trainer
from deep_q_learning_tpu.utils import aot


def _cache_files(d):
    return sorted(f for f in os.listdir(d) if f.endswith(".jaxexec"))


def test_load_or_compile_roundtrip(tmp_path):
    d = str(tmp_path)

    @jax.jit
    def f(x):
        return x * 2.0 + 1.0

    x = jnp.arange(8.0)
    c1 = aot.load_or_compile(f, x, cache_dir=d)
    files = _cache_files(d)
    assert len(files) == 1
    mtime = os.path.getmtime(os.path.join(d, files[0]))

    # second call must HIT the cache: same single file, not rewritten
    c2 = aot.load_or_compile(f, x, cache_dir=d)
    assert _cache_files(d) == files
    assert os.path.getmtime(os.path.join(d, files[0])) == mtime
    np.testing.assert_array_equal(np.asarray(c1(x)), np.asarray(c2(x)))

    # a different program gets its own entry
    @jax.jit
    def g(x):
        return x - 3.0

    aot.load_or_compile(g, x, cache_dir=d)
    assert len(_cache_files(d)) == 2


def test_salt_separates_kernel_static_configs(tmp_path):
    """ADVICE r4 (medium): cfg.double / cfg.huber_delta live ONLY inside the
    stripped Mosaic backend_config payloads when use_pallas=True, so two
    configs differing only there would alias to one cache entry.  The salt
    must split them — and an identical salt must still share one entry."""
    import dataclasses

    d = str(tmp_path)

    @jax.jit
    def f(x):
        return x * 2.0

    x = jnp.ones((4,))
    cfg_a = DQNConfig(use_pallas=True, double=True)
    cfg_b = dataclasses.replace(cfg_a, double=False)
    cfg_c = dataclasses.replace(cfg_a, huber_delta=2.0)
    salts = {aot.config_salt(c) for c in (cfg_a, cfg_b, cfg_c)}
    assert len(salts) == 3  # each kernel-static variant gets its own salt

    for c in (cfg_a, cfg_b, cfg_c):
        aot.load_or_compile(f, x, cache_dir=d, salt=aot.config_salt(c))
    assert len(_cache_files(d)) == 3

    # same salt, same program -> cache hit (no fourth entry)
    aot.load_or_compile(f, x, cache_dir=d, salt=aot.config_salt(cfg_a))
    assert len(_cache_files(d)) == 3


def test_corrupt_cache_entry_recompiles(tmp_path):
    d = str(tmp_path)

    @jax.jit
    def f(x):
        return x + 1.0

    x = jnp.ones((4,))
    aot.load_or_compile(f, x, cache_dir=d)
    (name,) = _cache_files(d)
    with open(os.path.join(d, name), "wb") as fh:
        fh.write(b"not a pickle")
    c = aot.load_or_compile(f, x, cache_dir=d)  # must not raise
    np.testing.assert_array_equal(np.asarray(c(x)), np.asarray(x) + 1.0)


def test_trainer_aot_cache(tmp_path):
    d = str(tmp_path)
    cfg = DQNConfig(
        env_id="CartPole-v1",
        num_envs=16,
        steps_per_superstep=8,
        batch_size=32,
        training_start=64,
        buffer_capacity=2048,
        double=False,
        dueling=False,
        hidden=(32, 32),
        return_window=16,
        seed=3,
    )
    tr = Trainer(cfg, aot_cache_dir=d).init()
    res = tr.train(max_env_steps=512, verbose=False)
    assert np.isfinite(res.final_window_mean)
    assert len(_cache_files(d)) == 2  # superstep + evaluator
    mtimes = {
        f: os.path.getmtime(os.path.join(d, f)) for f in _cache_files(d)
    }

    # a fresh process-equivalent trainer reuses both executables (no rewrite)
    tr2 = Trainer(cfg, aot_cache_dir=d).init()
    res2 = tr2.train(max_env_steps=512, verbose=False)
    assert np.isfinite(res2.final_window_mean)
    assert {
        f: os.path.getmtime(os.path.join(d, f)) for f in _cache_files(d)
    } == mtimes

    # runtime hyperparams still work through the AOT executable
    tr2.init()
    tr2.set_hyper(learning_rate=0.0, train_every=1_000_000)
    tr2.train(max_env_steps=512, verbose=False)
    assert int(tr2.runner.train.updates) == 0

    # evaluation through the cached evaluator executable
    rets, lengths, _trunc = tr2.evaluate(seed=1)
    assert rets.shape == lengths.shape and (rets >= 1).all()
