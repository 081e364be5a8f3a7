"""Pure-functional environment wrappers.

``TimeFractionObs`` reproduces the reference's observation augmentation
(``/root/reference/LunarLander/env.py:19-21``): append
``fraction_finished = step / max_steps`` as an extra feature, so the policy can
condition on remaining time under the episode cap.  Unlike the reference, no
``(1, D)`` batch axis is baked into single-instance observations — batching is
``vmap``'s job (the reference strips that axis again at
``q_agent.py:182``).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from deep_q_learning_tpu.envs.base import Environment


class WrappedEnv(Environment):
    """Base delegating wrapper."""

    def __init__(self, env: Environment):
        self.env = env

    def default_params(self):
        return self.env.default_params()

    @property
    def name(self) -> str:
        return f"{type(self).__name__}({self.env.name})"

    @property
    def num_actions(self) -> int:
        return self.env.num_actions

    def obs_shape(self, params) -> Tuple[int, ...]:
        return self.env.obs_shape(params)

    def reset_env(self, key, params):
        return self.env.reset_env(key, params)

    def step_env(self, key, state, action, params):
        return self.env.step_env(key, state, action, params)

    def get_obs(self, state, params):
        return self.env.get_obs(state, params)

    @property
    def batch_reset_cheap(self) -> bool:
        return self.env.batch_reset_cheap

    def reset_batch(self, key, n: int, params):
        obs, states = self.env.reset_batch(key, n, params)
        return jax.vmap(self.get_obs, in_axes=(0, None))(states, params), states


class TimeFractionObs(WrappedEnv):
    """Append ``t / max_steps`` to the observation (ref ``env.py:19-21``).

    Requires the wrapped env's state to expose an integer ``t`` field (all
    built-in envs do).
    """

    def obs_shape(self, params) -> Tuple[int, ...]:
        (d,) = self.env.obs_shape(params)
        return (d + 1,)

    def _augment(self, obs, state, params):
        frac = state.t.astype(jnp.float32) / params.max_steps_in_episode
        return jnp.concatenate([obs, frac[None]]).astype(jnp.float32)

    def reset_env(self, key, params):
        obs, state = self.env.reset_env(key, params)
        return self._augment(obs, state, params), state

    def step_env(self, key, state, action, params):
        obs, new_state, reward, terminated, truncated = self.env.step_env(
            key, state, action, params
        )
        return (
            self._augment(obs, new_state, params),
            new_state,
            reward,
            terminated,
            truncated,
        )

    def get_obs(self, state, params):
        return self._augment(self.env.get_obs(state, params), state, params)
