"""Load a trained checkpoint and evaluate/visualize greedy rollouts —
the reference's post-training phase (``Test/lunar_lander.py:80-86``: unpickle
params, render 10 episodes) as a standalone entry point.

Accepts either the reference-compatible pickle pair
(``<dir>/params.pickle`` + ``opt_state.pickle``) or an orbax run directory
written by ``Trainer.save``.

Usage:
    python examples/evaluate_checkpoint.py --ckpt runs/lunar/ref_format \\
        --env LunarLander-v2 --episodes 10 --out runs/eval
"""

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np

from deep_q_learning_tpu.config import lunar_per
from deep_q_learning_tpu.envs import VectorEnv, make_env
from deep_q_learning_tpu.models import QNetwork
from deep_q_learning_tpu.algos.evaluate import build_evaluator
from deep_q_learning_tpu.utils import checkpoint as ckpt
from deep_q_learning_tpu.utils.visualize import plot_lander_flight, record_trajectory


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", type=str, required=True)
    ap.add_argument("--env", type=str, default="LunarLander-v2")
    ap.add_argument("--episodes", type=int, default=10)
    ap.add_argument("--out", type=str, default="runs/eval")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    cfg = lunar_per()
    env, params_env = make_env(args.env, cfg.time_fraction_obs, cfg.max_steps_in_episode)
    net = QNetwork(num_actions=env.num_actions, hidden=cfg.hidden, dueling=cfg.dueling)

    if os.path.exists(os.path.join(args.ckpt, "params.pickle")):
        params, _ = ckpt.load_params_pickle(args.ckpt)
        params = jax.tree.map(jnp.asarray, params)
    else:  # orbax run dir: restore into a fresh template
        from deep_q_learning_tpu.train import Trainer

        tr = Trainer(cfg, workdir=args.ckpt).init()
        tr.restore()
        params = tr.runner.train.params

    venv = VectorEnv(env, args.episodes)
    evaluate = jax.jit(
        build_evaluator(venv, params_env, net, params_env.max_steps_in_episode)
    )
    rets, lengths, _trunc = evaluate(params, jax.random.PRNGKey(args.seed))
    rets = np.asarray(rets)
    print(
        f"eval over {args.episodes} greedy episodes: mean={rets.mean():.1f} "
        f"min={rets.min():.1f} max={rets.max():.1f} "
        f"(lengths {np.asarray(lengths).mean():.0f} avg)"
    )
    if args.env == "LunarLander-v2":
        os.makedirs(args.out, exist_ok=True)
        for i in range(min(3, args.episodes)):
            traj = record_trajectory(
                env, params_env, net, params, jax.random.PRNGKey(500 + i)
            )
            plot_lander_flight(traj, f"{args.out}/eval_rollout_{i}.png")
        print(f"flight-path figures -> {args.out}/")


if __name__ == "__main__":
    main()
