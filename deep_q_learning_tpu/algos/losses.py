"""TD targets and losses — vectorized, with deliberate ref-compat switches.

Replaces the reference's target builder
(``/root/reference/General/QLearning/q_learning_functions.py:42-64``) and loss
(``:31-39``).  The reference builds per-sample targets with a *Python for-loop
over the batch* that unrolls 64 gather ops into the jaxpr (SURVEY.md §3.2);
here one ``take_along_axis`` + ``where`` does the whole batch, and the loss is
the mathematically-equivalent gather-at-action TD regression (the reference's
full-vector huber regression contributes zero loss on non-taken actions).

Two documented reference quirks are reproducible behind flags (default FIXED):

* ``ref_terminal_quirk`` — the reference multiplies ``(1-done)`` into *both*
  the bootstrap and the ``-q[a]`` correction (q_learning_functions.py:58), so
  terminal transitions regress toward ``q[a] + r`` instead of ``r``.
* ``truncation_bootstrap`` — the reference forces ``done=True`` at the step
  cap (q_agent.py:179-180), wrongly cutting the bootstrap at time-limit
  truncations; we bootstrap through truncations unless disabled.
"""

from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp

from deep_q_learning_tpu.envs.base import Transition


def huber(err: jax.Array, delta: float = 1.0) -> jax.Array:
    """Huber loss on residuals (optax.huber_loss semantics)."""
    abs_err = jnp.abs(err)
    quad = jnp.minimum(abs_err, delta)
    return 0.5 * quad**2 + delta * (abs_err - quad)


def td_targets(
    q_next_online: jax.Array,  # (B, A) Q(s', .) under online params
    q_next_target: jax.Array,  # (B, A) Q(s', .) under target params
    reward: jax.Array,  # (B,)
    nonterminal: jax.Array,  # (B,) float32; 1.0 where bootstrap continues
    gamma: float,
    double: bool = True,
) -> jax.Array:
    """Standard (double-)DQN scalar targets: ``r + γ·(1-d)·boot``.

    double=True: ``boot = Q_target(s', argmax_a Q_online(s', a))``
    (ref q_learning_functions.py:55-58); else ``boot = max_a Q_target(s',a)``.
    """
    if double:
        best = jnp.argmax(q_next_online, axis=-1)
        boot = jnp.take_along_axis(q_next_target, best[:, None], axis=-1)[:, 0]
    else:
        boot = jnp.max(q_next_target, axis=-1)
    return reward + gamma * nonterminal * boot


def nonterminal_mask(batch: Transition, truncation_bootstrap: bool) -> jax.Array:
    """1.0 where the TD target should bootstrap from s'."""
    if truncation_bootstrap:
        done_for_td = batch.terminated
    else:  # ref-compat: truncation also cuts the bootstrap (q_agent.py:179-180)
        done_for_td = jnp.logical_or(batch.terminated, batch.truncated)
    return 1.0 - done_for_td.astype(jnp.float32)


def build_loss_fn(
    apply_fn: Callable,
    gamma: float,
    double: bool = True,
    loss: str = "huber",
    huber_delta: float = 1.0,
    ref_terminal_quirk: bool = False,
    truncation_bootstrap: bool = True,
) -> Callable:
    """Returns ``loss_fn(params, target_params, batch, weights) ->
    (scalar_loss, td_errors)``.

    ``weights`` are per-sample importance weights (PER); pass ones for
    uniform replay.  ``td_errors`` feed PER priority updates.
    """

    def loss_fn(
        params, target_params, batch: Transition, weights: jax.Array
    ) -> Tuple[jax.Array, jax.Array]:
        obs = batch.obs
        next_obs = batch.next_obs
        # One fused forward over [s; s'] under online params — the reference
        # computes model.apply three times per step and re-computes Q(s)
        # again inside the loss (SURVEY.md §3.2 "double compute").
        both = jnp.concatenate([obs, next_obs], axis=0)
        q_both = apply_fn(params, both)
        b = obs.shape[0]
        q_s, q_next_online = q_both[:b], q_both[b:]
        q_next_target = apply_fn(target_params, next_obs)

        nonterm = nonterminal_mask(batch, truncation_bootstrap)
        targets = td_targets(
            q_next_online, q_next_target, batch.reward, nonterm, gamma, double
        )
        q_taken = jnp.take_along_axis(q_s, batch.action[:, None], axis=-1)[:, 0]

        if ref_terminal_quirk:
            # Ref formula (q_learning_functions.py:58): the (1-d) factor also
            # scales the -q[a] correction, so terminal targets degenerate to
            # q[a] + r.  Expressed directly on the scalar target:
            targets = jnp.where(
                nonterm > 0, targets, q_taken + batch.reward
            )

        td_err = jax.lax.stop_gradient(targets) - q_taken
        if loss == "huber":
            per_sample = huber(td_err, huber_delta)
        elif loss == "mse":
            per_sample = 0.5 * td_err**2
        else:
            raise ValueError(f"unknown loss {loss!r}")
        return jnp.mean(weights * per_sample), td_err

    return loss_fn
