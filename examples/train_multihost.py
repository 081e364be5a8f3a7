"""Multi-chip / multi-host DDQN (BASELINE config 5): env instances sharded
over the ("env",) device mesh, replicated learner, gradient all-reduce over
ICI.  On a pod slice, launch one process per host (each calls
``jax.distributed.initialize`` via ``distributed_init``); on one host it uses
every local device; under ``XLA_FLAGS=--xla_force_host_platform_device_count=8``
it runs on a virtual CPU mesh for validation.

Usage:
    python examples/train_multihost.py [--steps 20000000]
"""

import argparse
import dataclasses

from deep_q_learning_tpu.config import multihost_ddqn
from deep_q_learning_tpu.parallel import distributed_init, make_env_mesh
from deep_q_learning_tpu.train import DistributedTrainer


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=20_000_000)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    distributed_init()
    mesh = make_env_mesh()
    n = mesh.devices.size
    cfg = dataclasses.replace(
        multihost_ddqn(),
        seed=args.seed,
        # keep per-shard sizes sane on any mesh size
        num_envs=max(1024, 128 * n) // n * n,
        batch_size=max(256, 32 * n) // n * n,
    )
    print(f"mesh: {n} devices; {cfg.num_envs} envs ({cfg.num_envs // n}/shard)")
    trainer = DistributedTrainer(cfg, mesh=mesh).init()
    result = trainer.train(max_env_steps=args.steps, log_every=10)
    print(
        f"solved={result.solved} env_steps={result.env_steps} "
        f"window={result.final_window_mean:.1f} wall={result.wall_time_s:.1f}s"
    )


if __name__ == "__main__":
    main()
