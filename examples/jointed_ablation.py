"""Ablation profile of the jointed lander's per-frame cost on the TPU.

The iteration sweep (artifacts/jointed_iters_sweep.json) shows the solver's
velocity+position ITERATIONS are nearly free at 1024 envs (120->1 vel iters
buys ~7%); the jointed engine's ~2.4x frame cost over the rigid engine must
live in per-frame fixed structures.  This probe times a bare env frame loop
(no learner/replay: `lax.fori_loop` of `VectorEnv.step` with a fixed action)
under component stubs, monkey-patching `lander_solver` module globals
BEFORE trace so the jit specializes each variant:

  * full          — the shipped jointed step
  * no_collide    — `collide_leg` returns inactive manifolds (cost of the
                    terrain segment lookup + corner separation geometry)
  * no_solver     — `assembly_step` replaced by ballistic integration (total
                    collide+setup+solve+pack cost)
  * rigid         — the round-2 single-body engine, for reference

Usage (TPU):  python examples/jointed_ablation.py [--envs 1024]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def build_frame_loop(jointed: bool, num_envs: int, frames: int):
    import jax
    import jax.numpy as jnp

    from deep_q_learning_tpu.envs import VectorEnv, make_env

    env, p = make_env(
        "LunarLander-v2", False, 1000,
        param_overrides={"jointed": jointed, "vel_iters": 120, "pos_iters": 40},
    )
    venv = VectorEnv(env, num_envs)

    def run(key):
        obs, states = venv.reset(key, p)

        def body(i, carry):
            obs, states, k = carry
            k, sk = jax.random.split(k)
            actions = jnp.full((num_envs,), 2, jnp.int32)  # burn: engines on
            obs, states, tr = venv.step(sk, states, actions, p)
            return obs, states, k

        obs, states, _ = jax.lax.fori_loop(0, frames, body, (obs, states, key))
        return jnp.sum(obs[:, 1])  # host-fetchable scalar

    return jax.jit(run)


def timeit(fn, reps=3):
    import jax

    key = jax.random.PRNGKey(0)
    float(fn(key))  # compile + first exec
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        float(fn(key))
        best = min(best, time.perf_counter() - t0)
    return best


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--envs", type=int, default=1024)
    ap.add_argument("--frames", type=int, default=256)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from deep_q_learning_tpu.envs import lander_solver as ls

    FPS = 50.0

    orig_assembly = ls.assembly_step
    orig_collide = ls.collide_leg

    def ballistic_assembly(hull, leg1, leg2, terrain, fx, fy, torque, gravity,
                           acc=None, dt=1.0 / FPS, vel_iters=120, pos_iters=40,
                           vel_tol=0.0, return_iters=False):
        if acc is None:
            acc = ls.zero_acc()

        def integrate(b, ax, ay, aw):
            vx, vy, w = b.vx + dt * ax, b.vy + dt * ay, b.w + dt * aw
            return b._replace(
                cx=b.cx + dt * vx, cy=b.cy + dt * vy, a=b.a + dt * w,
                vx=vx, vy=vy, w=w,
            )

        hull = integrate(hull, fx * ls.IMH, gravity + fy * ls.IMH, torque * ls.IIH)
        leg1 = integrate(leg1, 0.0, gravity, 0.0)
        leg2 = integrate(leg2, 0.0, gravity, 0.0)
        false = jnp.zeros_like(hull.cx, dtype=bool)
        out = (hull, leg1, leg2, false, false, false, false, acc)
        return out + (jnp.int32(0),) if return_iters else out

    def stub_collide(terrain, leg):
        # constant inactive manifold, NO terrain geometry: isolates the cost
        # of _segment gathers + corner separation + deepest-two selection
        z = jnp.zeros_like(leg.cx)
        f = jnp.zeros_like(leg.cx, dtype=bool)
        i = jnp.zeros_like(leg.cx, dtype=jnp.int32)
        c = ls.LegContacts(
            active1=f, active2=f, nx1=z, ny1=z + 1.0, nx2=z, ny2=z + 1.0,
            px1=z, py1=z, px2=z, py2=z, lx1=z, ly1=z, lx2=z, ly2=z,
            sx1=z, sh1=z, sx2=z, sh2=z, block=f, idx1=i, idx2=i + 1,
        )
        return c, f

    variants = {}
    fl = build_frame_loop(True, args.envs, args.frames)
    variants["full"] = timeit(fl)

    ls.collide_leg = stub_collide
    try:
        variants["no_collide_geom"] = timeit(
            build_frame_loop(True, args.envs, args.frames)
        )
    finally:
        ls.collide_leg = orig_collide

    ls.assembly_step = ballistic_assembly
    try:
        variants["no_solver"] = timeit(
            build_frame_loop(True, args.envs, args.frames)
        )
    finally:
        ls.assembly_step = orig_assembly

    variants["rigid"] = timeit(build_frame_loop(False, args.envs, args.frames))

    per_frame_us = {
        k: round(v / args.frames * 1e6, 1) for k, v in variants.items()
    }
    out = {
        "metric": "jointed_frame_ablation",
        "num_envs": args.envs,
        "frames": args.frames,
        "wall_s": {k: round(v, 3) for k, v in variants.items()},
        "per_frame_us": per_frame_us,
        "backend": jax.default_backend(),
    }
    print(json.dumps(out))
    path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                        "artifacts", "jointed_ablation.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
