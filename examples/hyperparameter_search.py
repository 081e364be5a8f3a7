"""Bayesian hyperparameter search for LunarLander DQN — the rebuild of
``/root/reference/Test/lunar_lander_hyper_params.py:19-79`` (bayes_opt UCB,
20 trials x 500 episodes over γ/ε-schedule/replace/batch/train_freq).

Fixed vs the reference (SURVEY.md §3.3-3.4): each trial runs a FRESH trainer
(no state carry-over between trials) and the objective is the mean of true
greedy eval returns (the ref maximized its own training-window average).

Usage:
    python examples/hyperparameter_search.py [--trials 20] [--steps-per-trial 2000000]
"""

import argparse
import dataclasses
import json

from deep_q_learning_tpu.config import lunar_dddqn_vector
from deep_q_learning_tpu.hpo import REFERENCE_SPACE, make_dqn_objective, optimize


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--trials", type=int, default=20)  # ref: 20 runs
    ap.add_argument("--steps-per-trial", type=int, default=2_000_000)
    ap.add_argument("--out", type=str, default="runs/hpo_result.json")
    args = ap.parse_args()

    base = dataclasses.replace(
        lunar_dddqn_vector(),
        solve_threshold=None,  # trials run their full budget
        eps_schedule="exp_episode",  # the space tunes the ref's ε params
        target_sync_mode="episodes",
        target_tau=None,  # Polyak off: the space tunes the ref's hard-sync
        # cadence (target_replace_episodes), which Polyak would disable
    )
    objective = make_dqn_objective(base, env_steps_per_trial=args.steps_per_trial)
    result = optimize(objective, REFERENCE_SPACE, num_trials=args.trials)
    print(f"best objective (mean eval return): {result.best_objective:.2f}")
    print(f"best params: {result.best_params}")
    import os

    os.makedirs(os.path.dirname(os.path.abspath(args.out)), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(
            {
                "best_objective": result.best_objective,
                "best_params": result.best_params,
                "trials": [
                    {"params": t.params, "objective": t.objective}
                    for t in result.trials
                ],
            },
            f,
            indent=2,
        )


if __name__ == "__main__":
    main()
