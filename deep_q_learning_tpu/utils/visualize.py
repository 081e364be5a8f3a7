"""Greedy-rollout recording and visualization.

The reference's ``generate_visualization`` (utils.py:43-52) opens a Gym
render window and steps one greedy episode on the host.  Headless TPU pods
have no display, so the equivalent here is (a) a jitted greedy trajectory
recorder (whole rollout on device, one host fetch) and (b) plot/dump helpers:
a LunarLander flight-path figure and an .npz trajectory dump that any
host-side viewer can replay.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np


def record_trajectory(
    env,
    env_params,
    network,
    params,
    key: jax.Array,
    max_steps: Optional[int] = None,
) -> Dict[str, np.ndarray]:
    """One greedy episode, recorded fully on device via ``lax.scan``.

    Returns host arrays: obs (T, D), action (T,), reward (T,), done (T,),
    plus ``length`` and ``ret`` (masked to the first termination)."""
    max_steps = max_steps or env_params.max_steps_in_episode
    reset_key, loop_key = jax.random.split(key)

    @jax.jit
    def rollout(params, reset_key, loop_key):
        obs0, state0 = env.reset(reset_key, env_params)

        def step_fn(carry, step_key):
            obs, state, done = carry
            action = jnp.argmax(network.apply(params, obs[None])[0]).astype(jnp.int32)
            nobs, nstate, reward, term, trunc = env.step(step_key, state, action, env_params)
            now_done = term | trunc
            out = {
                "obs": obs,
                "action": action,
                "reward": jnp.where(done, 0.0, reward),
                "done": now_done,
                "live": ~done,
            }
            # freeze the state after the first termination
            keep = lambda new, old: jax.tree.map(
                lambda n, o: jnp.where(done, o, n), new, old
            )
            return (keep(nobs, obs), keep(nstate, state), done | now_done), out

        keys = jax.random.split(loop_key, max_steps)
        _, traj = jax.lax.scan(step_fn, (obs0, state0, jnp.array(False)), keys)
        return traj

    traj = jax.device_get(rollout(params, reset_key, loop_key))
    live = traj["live"].astype(bool)
    length = int(live.sum())
    return {
        "obs": traj["obs"][:length],
        "action": traj["action"][:length],
        "reward": traj["reward"][:length],
        "done": traj["done"][:length],
        "length": length,
        "ret": float(traj["reward"][:length].sum()),
    }


def dump_trajectory(path: str, traj: Dict[str, Any]) -> str:
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    np.savez_compressed(path, **{k: v for k, v in traj.items()})
    return path


def plot_lander_flight(traj: Dict[str, Any], path: str) -> str:
    """Flight-path figure for a LunarLander trajectory: x/y path colored by
    time, altitude & velocity traces, action raster."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    obs = traj["obs"]
    fig, (ax1, ax2, ax3) = plt.subplots(1, 3, figsize=(15, 4))
    t = np.arange(len(obs))
    sc = ax1.scatter(obs[:, 0], obs[:, 1], c=t, s=4, cmap="viridis")
    ax1.axhline(0.0, color="gray", lw=1)
    ax1.set_title(f"flight path (return {traj['ret']:.1f})")
    ax1.set_xlabel("x (helipad-relative)")
    ax1.set_ylabel("y")
    fig.colorbar(sc, ax=ax1, label="step")
    ax2.plot(t, obs[:, 1], label="altitude")
    ax2.plot(t, obs[:, 3], label="v_y")
    ax2.plot(t, obs[:, 4], label="angle")
    ax2.legend()
    ax2.grid(alpha=0.3)
    ax2.set_title("state traces")
    ax3.step(t, traj["action"], where="post", lw=0.8)
    ax3.set_yticks([0, 1, 2, 3], ["nop", "left", "main", "right"])
    ax3.set_title("actions")
    fig.tight_layout()
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    fig.savefig(path, dpi=110)
    plt.close(fig)
    return path
