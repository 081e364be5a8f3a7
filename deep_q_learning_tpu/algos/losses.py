"""TD losses over :class:`~deep_q_learning_tpu.replay.nstep.LearnBatch`.

Replaces the reference's target builder
(``/root/reference/General/QLearning/q_learning_functions.py:42-64``) and loss
(``:31-39``).  The reference builds per-sample targets with a *Python for-loop
over the batch* that unrolls 64 gather ops into the jaxpr (SURVEY.md §3.2);
here one ``take_along_axis`` + ``where`` covers the whole batch, and the loss
is the mathematically-equivalent gather-at-action TD regression (the
reference's full-vector huber regression contributes zero loss on non-taken
actions; gradient-equivalence is tested).

Episode-boundary semantics (n-step returns, termination-vs-truncation, γ^K)
are folded into ``LearnBatch.bootstrap`` by the replay layer at sample time
(``replay/nstep.py``), so the loss is simply

    td   = stop_grad(G + bootstrap · boot(s')) − Q(s, a)
    loss = mean(w · huber_δ(td))

Reference quirk, reproducible behind a flag (default FIXED):
``ref_terminal_quirk`` — the reference multiplies ``(1-done)`` into *both*
the bootstrap and the ``−q[a]`` correction (q_learning_functions.py:58), so
terminal transitions regress toward ``q[a] + r`` instead of ``r``.  With the
ref-compat settings (n_step=1, truncation_bootstrap=False) ``bootstrap == 0``
exactly at the reference's ``done`` positions, so the quirk is applied where
``bootstrap == 0``.
"""

from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp

from deep_q_learning_tpu.replay.nstep import LearnBatch


def huber(err: jax.Array, delta: float = 1.0) -> jax.Array:
    """Huber loss on residuals (optax.huber_loss semantics)."""
    abs_err = jnp.abs(err)
    quad = jnp.minimum(abs_err, delta)
    return 0.5 * quad**2 + delta * (abs_err - quad)


def td_targets(
    q_next_online: jax.Array,  # (B, A) Q(s', .) under online params
    q_next_target: jax.Array,  # (B, A) Q(s', .) under target params
    reward: jax.Array,  # (B,) n-step return G
    bootstrap: jax.Array,  # (B,) γ^K · nonterminal
    double: bool = True,
) -> jax.Array:
    """Scalar targets ``G + bootstrap · boot``.

    double=True: ``boot = Q_target(s', argmax_a Q_online(s', a))``
    (ref q_learning_functions.py:55-58); else ``boot = max_a Q_target``."""
    if double:
        best = jnp.argmax(q_next_online, axis=-1)
        boot = jnp.take_along_axis(q_next_target, best[:, None], axis=-1)[:, 0]
    else:
        boot = jnp.max(q_next_target, axis=-1)
    return reward + bootstrap * boot


def build_loss_fn(
    apply_fn: Callable,
    double: bool = True,
    loss: str = "huber",
    huber_delta: float = 1.0,
    ref_terminal_quirk: bool = False,
) -> Callable:
    """Returns ``loss_fn(params, target_params, batch: LearnBatch, weights) ->
    (scalar_loss, td_errors)``.

    ``weights`` are per-sample importance weights (PER); pass ones for
    uniform replay.  ``td_errors`` feed PER priority updates."""

    def loss_fn(
        params, target_params, batch: LearnBatch, weights: jax.Array
    ) -> Tuple[jax.Array, jax.Array]:
        # One fused forward over [s; s'] under online params — the reference
        # runs model.apply three times per step and re-computes Q(s) again
        # inside the loss (SURVEY.md §3.2 "double compute").
        both = jnp.concatenate([batch.obs, batch.next_obs], axis=0)
        q_both = apply_fn(params, both)
        b = batch.obs.shape[0]
        q_s, q_next_online = q_both[:b], q_both[b:]
        q_next_target = apply_fn(target_params, batch.next_obs)

        targets = td_targets(
            q_next_online, q_next_target, batch.reward, batch.bootstrap, double
        )
        q_taken = jnp.take_along_axis(q_s, batch.action[:, None], axis=-1)[:, 0]

        if ref_terminal_quirk:
            # ref formula (q_learning_functions.py:58): terminal targets
            # degenerate to q[a] + r (see module docstring)
            targets = jnp.where(
                batch.bootstrap > 0, targets, q_taken + batch.reward
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
