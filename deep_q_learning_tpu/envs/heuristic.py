"""Heuristic LunarLander controller (PD on angle + hover), jittable.

The classic open-source demo controller for this task: target an angle
proportional to horizontal offset+velocity, a hover height proportional to
|x|, fire the engine whose correction is most needed.  Used as (a) a
task-level fidelity check for the pure-JAX physics — it must land and score
>200 like it does on the Box2D env — and (b) an evaluation baseline.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def heuristic_action(obs: jax.Array) -> jax.Array:
    """obs: (8,) LunarLander observation -> discrete action (int32)."""
    x, y, vx, vy, angle, omega, l1, l2 = (obs[i] for i in range(8))

    angle_targ = jnp.clip(x * 0.5 + vx * 1.0, -0.4, 0.4)
    hover_targ = 0.55 * jnp.abs(x)

    angle_todo = (angle_targ - angle) * 0.5 - omega * 1.0
    hover_todo = (hover_targ - y) * 0.5 - vy * 0.5

    grounded = (l1 > 0.5) | (l2 > 0.5)
    angle_todo = jnp.where(grounded, 0.0, angle_todo)
    hover_todo = jnp.where(grounded, -vy * 0.5, hover_todo)

    main = (hover_todo > jnp.abs(angle_todo)) & (hover_todo > 0.05)
    action = jnp.where(
        main,
        2,
        jnp.where(angle_todo < -0.05, 3, jnp.where(angle_todo > 0.05, 1, 0)),
    )
    return action.astype(jnp.int32)
