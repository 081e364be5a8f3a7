"""LunarLander-v2 dynamics in pure JAX (Box2D-free).

The reference trains on Gym's `LunarLander-v2` (Box2D on the host,
``/root/reference/Test/lunar_lander.py:44``); every env step is a host call
(``q_agent.py:177``).  This module re-implements the *task* — same action
space, observation layout, reward shaping, and termination semantics as the
published environment spec — as pure jittable JAX, so thousands of landers
step in lockstep on the TPU.

Faithfulness notes (what matches the published spec):
  * 50 FPS frame time, world gravity -10, SCALE 30 with a 600x400 viewport
    => world is 20 x 13.33 units, helipad at H/4.
  * Discrete actions {nop, left engine, main engine, right engine};
    MAIN_ENGINE_POWER 13.0, SIDE_ENGINE_POWER 0.6, with per-firing dispersion
    noise; fuel costs -0.30 (main) and -0.03 (side) per frame.
  * Observation: [x, y (helipad-relative, normalized), vx, vy (normalized),
    angle, 20*omega/FPS, leg1_contact, leg2_contact].
  * Shaping reward: 100*(shaping_t - shaping_{t-1}) with
    shaping = -100*dist - 100*speed - 100*|angle| + 10*leg1 + 10*leg2,
    terminal -100 on crash / out-of-bounds, +100 on rest.
  * Terrain: 11 seeded chunk heights, smoothed, with a flat helipad across
    the center 5 chunks.

Deliberate simplification (documented divergence): the Box2D rigid-body
solver (polygon hull, revolute leg joints, sequential-impulse contacts) is
replaced by a single rigid body with two leg-tip contact points resolved by
inelastic normal impulses + Coulomb-style tangential damping.  Fixed-seed
trajectories are *exactly reproducible* within this env (jit-vs-jit bitwise;
tested), and cross-checked against an independent numpy transcription of the
same dynamics; step-level Box2D parity is NOT claimed — task-level parity is
validated by a heuristic-controller landing test (scores >200, as the same
controller does on the Box2D env) and by DQN learning curves.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import struct

from deep_q_learning_tpu.envs.base import Environment, EnvParams

# world geometry (published spec constants)
FPS = 50.0
SCALE = 30.0
VIEWPORT_W = 600.0
VIEWPORT_H = 400.0
W = VIEWPORT_W / SCALE  # 20.0
H = VIEWPORT_H / SCALE  # 13.333
CHUNKS = 11
HELIPAD_Y = H / 4.0

MAIN_ENGINE_POWER = 13.0
SIDE_ENGINE_POWER = 0.6
INITIAL_RANDOM = 1000.0  # magnitude of the random kick applied at reset

LEG_AWAY = 20.0 / SCALE
LEG_DOWN = 18.0 / SCALE
LEG_H = 8.0 / SCALE
SIDE_ENGINE_HEIGHT = 14.0 / SCALE
SIDE_ENGINE_AWAY = 12.0 / SCALE

# effective rigid-body constants (hull density 5.0 over the published hull
# polygon gives ~4.8 mass units; legs add ~0.2; inertia from the hull extent)
LANDER_MASS = 5.0
LANDER_INERTIA = 1.5
HULL_CLEARANCE = 10.0 / SCALE  # hull bottom below COM; contact below => crash


@struct.dataclass
class LunarLanderState:
    x: jax.Array
    y: jax.Array
    vx: jax.Array
    vy: jax.Array
    angle: jax.Array
    omega: jax.Array
    leg1: jax.Array  # bool contact
    leg2: jax.Array
    terrain: jax.Array  # (CHUNKS,) chunk heights
    prev_shaping: jax.Array
    t: jax.Array


@struct.dataclass
class LunarLanderParams(EnvParams):
    gravity: float = -10.0
    random_terrain: bool = struct.field(pytree_node=False, default=True)
    enable_wind: bool = struct.field(pytree_node=False, default=False)
    wind_power: float = 15.0
    turbulence_power: float = 1.5
    max_steps_in_episode: int = struct.field(pytree_node=False, default=1000)


def _terrain_height(terrain: jax.Array, x: jax.Array) -> jax.Array:
    """Piecewise-linear terrain height at world x (chunks span [0, W])."""
    chunk_w = W / (CHUNKS - 1)
    xi = jnp.clip(x / chunk_w, 0.0, CHUNKS - 1 - 1e-6)
    i0 = jnp.floor(xi).astype(jnp.int32)
    frac = xi - i0.astype(jnp.float32)
    h0 = terrain[i0]
    h1 = terrain[jnp.minimum(i0 + 1, CHUNKS - 1)]
    return h0 * (1.0 - frac) + h1 * frac


class LunarLander(Environment[LunarLanderState, LunarLanderParams]):
    """LunarLander-v2 task in pure JAX; see module docstring for fidelity."""

    def default_params(self) -> LunarLanderParams:
        return LunarLanderParams()

    @property
    def num_actions(self) -> int:
        return 4

    def obs_shape(self, params: LunarLanderParams) -> Tuple[int, ...]:
        return (8,)

    # ------------------------------------------------------------------ reset
    def reset_env(self, key: jax.Array, params: LunarLanderParams):
        terrain_key, kick_key = jax.random.split(key)
        # seeded terrain: uniform chunk heights smoothed by a 3-tap average,
        # helipad flattened across the center 5 chunk points (published spec)
        raw = jax.random.uniform(
            terrain_key, (CHUNKS,), minval=0.0, maxval=HELIPAD_Y * 2.0
        )
        if not params.random_terrain:
            raw = jnp.full((CHUNKS,), HELIPAD_Y)
        smooth = (
            0.33 * (jnp.roll(raw, 1) + raw + jnp.roll(raw, -1))
        )
        center = CHUNKS // 2
        idx = jnp.arange(CHUNKS)
        helipad_mask = jnp.abs(idx - center) <= 2
        terrain = jnp.where(helipad_mask, HELIPAD_Y, smooth)

        # start at top center with a random kick (spec: uniform force up to
        # INITIAL_RANDOM applied to the fresh body; expressed as velocity)
        kick = jax.random.uniform(kick_key, (2,), minval=-INITIAL_RANDOM, maxval=INITIAL_RANDOM)
        state = LunarLanderState(
            x=jnp.float32(W / 2.0),
            y=jnp.float32(H),
            vx=kick[0] / FPS / LANDER_MASS,
            vy=kick[1] / FPS / LANDER_MASS,
            angle=jnp.float32(0.0),
            omega=jnp.float32(0.0),
            leg1=jnp.array(False),
            leg2=jnp.array(False),
            terrain=terrain,
            prev_shaping=jnp.float32(0.0),
            t=jnp.int32(0),
        )
        shaping = self._shaping(state)
        state = state.replace(prev_shaping=shaping)
        return self.get_obs(state, params), state

    # ------------------------------------------------------------------- obs
    def get_obs(self, state: LunarLanderState, params: LunarLanderParams) -> jax.Array:
        return jnp.stack(
            [
                (state.x - W / 2.0) / (W / 2.0),
                (state.y - (HELIPAD_Y + LEG_DOWN)) / (H / 2.0),
                state.vx * (W / 2.0) / FPS,
                state.vy * (H / 2.0) / FPS,
                state.angle,
                20.0 * state.omega / FPS,
                state.leg1.astype(jnp.float32),
                state.leg2.astype(jnp.float32),
            ]
        ).astype(jnp.float32)

    def _shaping(self, state: LunarLanderState) -> jax.Array:
        """The published potential: distance + speed + tilt + leg bonuses,
        computed on the normalized observation coordinates."""
        ox = (state.x - W / 2.0) / (W / 2.0)
        oy = (state.y - (HELIPAD_Y + LEG_DOWN)) / (H / 2.0)
        ovx = state.vx * (W / 2.0) / FPS
        ovy = state.vy * (H / 2.0) / FPS
        return (
            -100.0 * jnp.sqrt(ox**2 + oy**2)
            - 100.0 * jnp.sqrt(ovx**2 + ovy**2)
            - 100.0 * jnp.abs(state.angle)
            + 10.0 * state.leg1.astype(jnp.float32)
            + 10.0 * state.leg2.astype(jnp.float32)
        )

    # ------------------------------------------------------------------ step
    def step_env(self, key, state: LunarLanderState, action, params: LunarLanderParams):
        dt = 1.0 / FPS
        disp_key, wind_key = jax.random.split(key)

        m_power = jnp.where(action == 2, 1.0, 0.0)
        s_power = jnp.where((action == 1) | (action == 3), 1.0, 0.0)
        side_dir = jnp.where(action == 3, 1.0, jnp.where(action == 1, -1.0, 0.0))

        sin_a = jnp.sin(state.angle)
        cos_a = jnp.cos(state.angle)

        # engine dispersion noise (spec: uniform(-1,1)/SCALE per axis)
        disp = jax.random.uniform(disp_key, (2,), minval=-1.0, maxval=1.0) / SCALE

        # Main engine: the per-frame impulse the *lander* receives is the
        # engine power scaled by the nozzle-offset geometry (~4/SCALE plus
        # dispersion) — the exhaust particle carries the rest.  Net
        # thrust/weight ~1.8 at full power, matching the game's feel.
        j_main = MAIN_ENGINE_POWER * m_power * (4.0 / SCALE + 2.0 * disp[0])
        dvx = -sin_a * j_main / LANDER_MASS
        dvy = cos_a * j_main / LANDER_MASS
        # lateral dispersion of the application point -> random torque
        dw_main = -j_main * disp[1] / LANDER_INERTIA

        # Side engines: lander impulse scaled by SIDE_ENGINE_AWAY/SCALE (+
        # dispersion), applied at SIDE_ENGINE_HEIGHT above the COM -> both a
        # lateral kick and a restoring torque (the craft's attitude control)
        j_side = SIDE_ENGINE_POWER * s_power * (
            SIDE_ENGINE_AWAY / SCALE + 3.0 * disp[1]
        )
        dvx = dvx + side_dir * cos_a * j_side / LANDER_MASS
        dvy = dvy + side_dir * sin_a * j_side / LANDER_MASS
        dw_side = -side_dir * j_side * SIDE_ENGINE_HEIGHT / LANDER_INERTIA

        vx = state.vx + dvx
        vy = state.vy + dvy + params.gravity * dt
        omega = state.omega + dw_main + dw_side

        if params.enable_wind:
            wk1, wk2 = jax.random.split(wind_key)
            wind = params.wind_power * jax.random.uniform(wk1, minval=-1.0, maxval=1.0)
            torq = params.turbulence_power * jax.random.uniform(wk2, minval=-1.0, maxval=1.0)
            vx = vx + wind / LANDER_MASS * dt
            omega = omega + torq / LANDER_INERTIA * dt

        x = state.x + vx * dt
        y = state.y + vy * dt
        angle = state.angle + omega * dt

        # ---------------- contacts: two leg tips + hull bottom -------------
        # leg tip body offsets (±LEG_AWAY lateral, LEG_DOWN+LEG_H below COM)
        tip_dy = -(LEG_DOWN + LEG_H)

        def world_point(bx, by):
            return (
                x + bx * cos_a - by * sin_a,
                y + bx * sin_a + by * cos_a,
            )

        l1x, l1y = world_point(-LEG_AWAY, tip_dy)
        l2x, l2y = world_point(LEG_AWAY, tip_dy)
        g1 = _terrain_height(state.terrain, l1x)
        g2 = _terrain_height(state.terrain, l2x)
        leg1 = l1y <= g1
        leg2 = l2y <= g2
        any_contact = jnp.logical_or(leg1, leg2)

        both_contact = jnp.logical_and(leg1, leg2)
        single_contact = jnp.logical_and(any_contact, jnp.logical_not(both_contact))

        # impact-speed crash: the leg suspension absorbs a firm set-down (the
        # heuristic lands at 2-4 m/s) but a free-fall slam (random policy:
        # ~10-13 m/s) drives the hull into the ground -> game over
        impact_speed = jnp.sqrt(vx**2 + vy**2)
        hard_impact = jnp.logical_and(any_contact, impact_speed > 6.0)

        # inelastic normal impulse: cancel downward velocity; position snap
        pen = jnp.maximum(jnp.where(leg1, g1 - l1y, 0.0), jnp.where(leg2, g2 - l2y, 0.0))
        y = jnp.where(any_contact, y + pen, y)
        vy = jnp.where(any_contact, jnp.maximum(vy, 0.0) * 0.1, vy)
        # ground friction: strong on two legs, mild while pivoting on one
        vx = jnp.where(both_contact, vx * 0.5, jnp.where(single_contact, vx * 0.8, vx))
        # rotation: two legs -> heavily damped (settling); one leg -> pivot
        # about the contact under gravity torque so the craft either drops
        # its other leg or topples onto the hull (as the rigid solver would)
        omega = jnp.where(both_contact, omega * 0.3, omega)
        lever = jnp.where(leg1 & ~leg2, -LEG_AWAY, jnp.where(leg2 & ~leg1, LEG_AWAY, 0.0))
        omega = omega + lever * (-params.gravity) * cos_a * dt / LANDER_INERTIA
        # pivoting lowers the COM: rotation about the tip converts to descent
        y = jnp.where(single_contact, y - jnp.abs(omega) * LEG_AWAY * dt, y)

        # hull bottom touching ground, or drifting out of bounds => crash
        hx, hy = world_point(0.0, -HULL_CLEARANCE)
        gh = _terrain_height(state.terrain, hx)
        hull_hit = hy <= gh
        tipped = jnp.abs(angle) > 1.2  # beyond recovery: treat as crash contact
        out_of_bounds = jnp.abs((x - W / 2.0) / (W / 2.0)) >= 1.0
        game_over = hull_hit | out_of_bounds | (tipped & any_contact) | hard_impact

        # at rest on both legs => successful landing (Box2D "not awake")
        speed = jnp.sqrt(vx**2 + vy**2)
        rest = (
            leg1
            & leg2
            & (speed < 0.08)
            & (jnp.abs(omega) < 0.08)
        )

        new_state = LunarLanderState(
            x=x,
            y=y,
            vx=vx,
            vy=vy,
            angle=angle,
            omega=omega,
            leg1=leg1,
            leg2=leg2,
            terrain=state.terrain,
            prev_shaping=state.prev_shaping,
            t=state.t + 1,
        )

        # ---------------- reward ------------------------------------------
        shaping = self._shaping(new_state)
        reward = shaping - state.prev_shaping
        new_state = new_state.replace(prev_shaping=shaping)
        reward = reward - m_power * 0.30 - s_power * 0.03
        reward = jnp.where(game_over, -100.0, jnp.where(rest, 100.0, reward))

        terminated = jnp.logical_or(game_over, rest)
        truncated = jnp.logical_and(
            new_state.t >= params.max_steps_in_episode, jnp.logical_not(terminated)
        )
        return (
            self.get_obs(new_state, params),
            new_state,
            reward.astype(jnp.float32),
            terminated,
            truncated,
        )
