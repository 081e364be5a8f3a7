"""Vanilla DQN on 4096 lockstep pure-JAX CartPole envs (BASELINE config 2).

Usage:
    python examples/train_cartpole.py [--steps 5000000]
"""

import argparse
import dataclasses

from deep_q_learning_tpu.config import cartpole_vector
from deep_q_learning_tpu.train import Trainer
from deep_q_learning_tpu.utils.metrics import plot_history


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=5_000_000)
    ap.add_argument("--workdir", type=str, default="runs/cartpole")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    cfg = dataclasses.replace(cartpole_vector(), seed=args.seed)
    trainer = Trainer(cfg, workdir=args.workdir).init()
    result = trainer.train(max_env_steps=args.steps, log_every=10)
    print(
        f"solved={result.solved} env_steps={result.env_steps} "
        f"window={result.final_window_mean:.1f} wall={result.wall_time_s:.1f}s"
    )
    plot_history(result.history, f"{args.workdir}/curves.png")


if __name__ == "__main__":
    main()
