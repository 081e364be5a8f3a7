"""Host-protocol adapters for the engine-fidelity experiment.

VERDICT.md (round 1) asks for DQN learning curves on the *real* Box2D
LunarLander vs the pure-JAX env, with the SAME algorithm code — so the only
varying factor is the physics engine.  :class:`HostAgent`
(``compat/host_loop.py``) already runs any stateful reset/step env; this
module supplies the two sides:

  * :class:`JaxHostEnv` — a pure-JAX :class:`~deep_q_learning_tpu.envs.base.
    Environment` behind the classic stateful 5-tuple API (jitted single-
    instance step, host-held state), and
  * :class:`TimeFractionHostWrapper` — the reference's observation
    augmentation (``/root/reference/LunarLander/env.py:9-31``: append
    ``fraction_finished = t / max_steps``) for host envs, so Box2D runs see
    the exact 9-feature observation the reference trained on.

``make_host_env`` builds either engine from one spec.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np


class JaxHostEnv:
    """Stateful host adapter over a pure-functional JAX environment.

    reset() -> (obs, info); step(a) -> (obs, reward, terminated, truncated,
    info) — the gymnasium 5-tuple protocol that ``HostAgent`` speaks.
    """

    def __init__(self, env, params=None, seed: int = 0):
        import jax
        import jax.numpy as jnp

        self.env = env
        self.params = env.default_params() if params is None else params
        self._key = jax.random.PRNGKey(seed)
        self._split = jax.jit(lambda k: tuple(jax.random.split(k)))
        self._jit_reset = jax.jit(env.reset)
        self._jit_step = jax.jit(env.step)
        self._as_i32 = lambda a: jnp.int32(a)
        self._state = None

    @property
    def num_actions(self) -> int:
        return self.env.num_actions

    def obs_dim(self) -> int:
        (d,) = self.env.obs_shape(self.params)
        return d

    def reset(self, seed: Optional[int] = None):
        import jax

        if seed is not None:
            self._key = jax.random.PRNGKey(seed)
        self._key, k = self._split(self._key)
        obs, self._state = self._jit_reset(k, self.params)
        return np.asarray(obs, np.float32), {}

    def step(self, action):
        self._key, k = self._split(self._key)
        obs, self._state, r, term, trunc = self._jit_step(
            k, self._state, self._as_i32(int(action)), self.params
        )
        return (
            np.asarray(obs, np.float32),
            float(r),
            bool(term),
            bool(trunc),
            {},
        )


class TimeFractionHostWrapper:
    """Append ``t / max_steps`` as an extra feature (ref ``env.py:19-21``).

    The reference increments its internal counter on every ``observation()``
    call, so the first post-reset obs carries fraction 0 and the obs after
    step k carries k/max_steps — matched here (and by the functional
    ``TimeFractionObs`` wrapper, which reads the env state's ``t``).
    """

    def __init__(self, env, max_steps: int):
        self.env = env
        self.max_steps = max_steps
        self._t = 0

    def __getattr__(self, name):
        return getattr(self.env, name)

    def _augment(self, obs: np.ndarray) -> np.ndarray:
        frac = np.float32(self._t / self.max_steps)
        return np.concatenate([np.asarray(obs, np.float32).reshape(-1), [frac]])

    def reset(self, seed: Optional[int] = None):
        out = self.env.reset(seed=seed) if seed is not None else self.env.reset()
        obs = out[0] if isinstance(out, tuple) else out
        self._t = 0
        return self._augment(obs), {}

    def step(self, action):
        out = self.env.step(action)
        self._t += 1
        if len(out) == 5:
            obs, r, term, trunc, info = out
        else:  # classic 4-tuple
            obs, r, done, info = out
            term, trunc = done, False
        return self._augment(obs), r, term, trunc, info


def make_host_env(
    engine: str,
    env_id: str = "LunarLander-v2",
    max_steps: int = 1500,
    time_fraction: bool = True,
    seed: int = 0,
) -> Tuple[object, int, int]:
    """Build a host env for ``engine`` in {"box2d", "jax"}.

    Returns (env, obs_dim, num_actions).  The Box2D side uses gymnasium's
    canonical implementation (LunarLander-v3 is the maintained registration
    of the reference's LunarLander-v2 task) UNWRAPPED — episode truncation is
    the agent's job, exactly as in the reference
    (``q_agent.py:179-180`` forces done at its own max_steps).
    """
    if engine == "jax":
        from deep_q_learning_tpu.envs import make_env

        env, params = make_env(env_id)
        if hasattr(params, "max_steps_in_episode"):
            params = params.replace(max_steps_in_episode=max_steps)
        base = JaxHostEnv(env, params, seed=seed)
        obs_dim, num_actions = base.obs_dim(), base.num_actions
    elif engine == "box2d":
        import gymnasium as gym

        gym_id = env_id
        if gym_id not in gym.registry:  # e.g. LunarLander-v2 -> -v3
            family = gym_id.split("-")[0]
            cands = sorted(k for k in gym.registry if k.split("-")[0] == family)
            if not cands:
                raise ValueError(f"no gymnasium registration for {env_id}")
            gym_id = cands[-1]
        base = gym.make(gym_id).unwrapped
        base.reset(seed=seed)
        obs_dim = int(np.prod(base.observation_space.shape))
        num_actions = int(base.action_space.n)
    else:
        raise ValueError(f"engine must be 'box2d' or 'jax', got {engine!r}")

    if time_fraction:
        base = TimeFractionHostWrapper(base, max_steps)
        obs_dim += 1
    return base, obs_dim, num_actions
