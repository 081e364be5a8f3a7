"""3-seed solve run of the fidelity engine ON THE TPU with the real preset
(VERDICT r4 weak #2 / item 5: the committed 3/3 evidence ran on CPU with
use_pallas=False during a service outage; this re-establishes it on the
target hardware with the shipped preset, post one-hot-rewrite solver).

Writes artifacts/lunar_jointed_solve.json in the round-3 shape.

Usage (TPU):  python examples/jointed_solve_seeds.py [--seeds 3]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", type=int, default=3)
    ap.add_argument("--max-steps", type=int, default=12_000_000)
    args = ap.parse_args()

    import jax
    import numpy as np

    from deep_q_learning_tpu.config import lunar_jointed_per
    from deep_q_learning_tpu.train import Trainer

    cfg = lunar_jointed_per()
    per_seed = []
    curves = {}
    for seed in range(args.seeds):
        tr = Trainer(
            cfg, aot_cache_dir=os.path.join(REPO, "runs", "aot_cache")
        ).init(seed=seed)
        t0 = time.time()
        res = tr.train(max_env_steps=args.max_steps, log_every=5, verbose=True)
        ev = tr.evaluate(seed=seed + 1000)
        best_window = max(r["window_mean"] for r in res.history)
        per_seed.append({
            "seed": seed,
            "solved": res.solved,
            "best_window": round(best_window, 1),
            "solved_at_env_steps": res.env_steps if res.solved else None,
            "greedy_eval_mean": round(float(np.mean(ev.returns)), 1),
            "greedy_eval_std": round(float(np.std(ev.returns)), 1),
            "eval_truncated": int(np.sum(ev.truncated)),
            "wall_s": round(time.time() - t0, 1),
        })
        curves[str(seed)] = [
            {"env_steps": r["env_steps"], "window": round(r["window_mean"], 1)}
            for r in res.history[:: max(1, len(res.history) // 40)]
        ]
        print(json.dumps(per_seed[-1]), flush=True)

    out = {
        "what": (
            "lunar_jointed_per preset (the lunar_per recipe on the "
            "Box2D-exact jointed 3-body engine, vel/pos iters 120/40) "
            "trained to solve on the TPU v5e with the shipped preset "
            "(use_pallas=True, post one-hot-rewrite solver); r5 re-run of "
            "the r4 CPU evidence (VERDICT r4 weak #2)"
        ),
        "engine": "jointed (envs/lander_solver.py)",
        "backend": jax.default_backend(),
        "use_pallas": cfg.use_pallas,
        "solve_threshold": cfg.solve_threshold,
        "seeds_solved": sum(1 for s in per_seed if s["solved"]),
        "seeds_total": len(per_seed),
        "per_seed": per_seed,
        "curves": curves,
    }
    with open(os.path.join(REPO, "artifacts", "lunar_jointed_solve.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({k: out[k] for k in ("seeds_solved", "seeds_total", "backend")}))


if __name__ == "__main__":
    main()
