"""Benchmark: aggregate env-steps/s with full training enabled.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N, ...}

Workload: BASELINE.json config 2 (CartPole vanilla DQN on vectorized pure-JAX
envs) with the learner ON (train_every=1, batch 512): every counted env step
comes from the full actor+replay+update superstep.  The instance count
defaults to 131072 — measured single-chip sweep (artifacts/
throughput_sweep.json): 4.1M steps/s at 4096 envs (dispatch-latency-bound
over the remote tunnel), 48M at 16384, 64M at 65536, 70.7M at 131072 (the
peak; 262144+ dips to ~60M, HBM-bound on env state + replay traffic).

``vs_baseline`` compares against the 1M env-steps/s north-star aggregate
target from BASELINE.json (the reference publishes no throughput numbers —
its host loop steps ONE Gym env at a time; SURVEY.md §6).

Self-describing (VERDICT r2 weak #3 / item 7): the JSON line carries
``num_envs`` (which config actually produced the headline number) and
``aot_warm`` (did the measurement hit the on-disk executable cache), so a
time-box fallback can never masquerade as the headline config.

Robustness: the remote TPU compile service has high latency variance, so the
preferred (large) configs run in time-boxed subprocesses; on timeout the
benchmark falls back to a smaller config whose compile is reliably fast.
Compiled executables are cached on disk (utils/aot.py), so reruns skip the
compile service entirely.  Timing is against host-side scalar fetches (the
tunnel's dispatch queue is async; see .claude/skills/verify).

Mesh scaling mode (VERDICT r2 item 6 — the harness that produces the
BASELINE ">=80% scaling efficiency" number the day multi-chip hardware
appears):

    python bench.py --mesh            # weak-scaling sweep N in {1,2,4,8}
    python bench.py --mesh 1 2 4      # explicit shard counts

Each N runs the REAL distributed program (parallel/distributed.py: shard_map
over an ("env",) mesh, replicated learner, in-graph psum/pmean metric
reduction) with a FIXED per-shard env count, and reports per-shard and
aggregate env-steps/s plus efficiency(N) = agg(N) / (N * agg(1)).  Backend
selection is automatic: real devices when the default backend exposes >= max
shard count (multi-chip TPU), else the virtual CPU mesh
(--xla_force_host_platform_device_count).  Result also lands in
``artifacts/mesh_scaling.json``.
"""

import json
import os
import subprocess
import sys
import time

_REPO = os.path.dirname(os.path.abspath(__file__))
_AOT_DIR = os.path.join(_REPO, "runs", "aot_cache")


def run_bench(num_envs: int, preset: str = "cartpole") -> dict:
    import dataclasses

    import jax

    from deep_q_learning_tpu.config import cartpole_vector, lunar_per_scaled
    from deep_q_learning_tpu.envs import VectorEnv, make_env
    from deep_q_learning_tpu.models import QNetwork
    from deep_q_learning_tpu.replay import make_replay
    from deep_q_learning_tpu.algos import build_superstep, make_optimizer

    if preset == "lunar":
        # the physics-heavy program: dueling DDQN + PER with the Pallas
        # kernels on (VERDICT r1 item 8 — regressions in the contact solver
        # or the Mosaic kernels must show up in the driver metric).  The
        # scaled preset holds the sample-per-transition ratio fixed while
        # batching the learner to the env count (solve-validated; see
        # config.lunar_per_scaled).
        cfg = lunar_per_scaled(num_envs)
    else:
        cfg = dataclasses.replace(
            cartpole_vector(),
            num_envs=num_envs,
            buffer_capacity=max(1 << 20, num_envs * 64),
        )
    env, p = make_env(
        cfg.env_id, cfg.time_fraction_obs, cfg.max_steps_in_episode,
        param_overrides=cfg.env_param_overrides(),
    )
    venv = VectorEnv(env, cfg.num_envs)
    net = QNetwork(num_actions=env.num_actions, hidden=cfg.hidden, dueling=cfg.dueling)
    replay = make_replay(cfg)
    init_runner, superstep = build_superstep(
        venv, p, net, make_optimizer(cfg), replay, cfg
    )
    runner = init_runner(jax.random.PRNGKey(0))
    from deep_q_learning_tpu.utils import aot

    jitted = jax.jit(superstep, donate_argnums=0)
    _, aot_warm = aot.cache_info(jitted, runner, cache_dir=_AOT_DIR)
    step = aot.load_or_compile(jitted, runner, cache_dir=_AOT_DIR)

    # warmup: compile + fill the buffer past training_start so the timed
    # region runs the full learner path
    for _ in range(4):
        runner, m = step(runner)
    float(m.window_mean)

    steps_per_call = cfg.steps_per_superstep * cfg.num_envs
    best = 0.0
    for _ in range(3):
        n = 30
        t0 = time.perf_counter()
        for _ in range(n):
            runner, m = step(runner)
        float(m.window_mean)  # host sync: don't trust async dispatch timing
        dt = time.perf_counter() - t0
        best = max(best, n * steps_per_call / dt)
    return {
        "value": best,
        "num_envs": num_envs,
        "preset": preset,
        "aot_warm": aot_warm,
        "backend": jax.default_backend(),
    }


def _timeboxed(num_envs: int, budget: int, preset: str = "cartpole"):
    """Run one measurement in a time-boxed child (remote-compile variance
    must not blow the caller's budget; the on-disk executable cache makes
    reruns immune to it).  Returns the child's info dict or None."""
    try:
        out = subprocess.run(
            [
                sys.executable,
                os.path.abspath(__file__),
                "--inner",
                str(num_envs),
                preset,
            ],
            capture_output=True,
            text=True,
            timeout=budget,
        )
        for line in out.stdout.splitlines():
            if line.startswith("{"):
                return json.loads(line)
    except (subprocess.TimeoutExpired, Exception):
        pass
    return None


# ---------------------------------------------------------------------------
# mesh weak-scaling harness (bench.py --mesh [N ...])
# ---------------------------------------------------------------------------

_MESH_ENVS_PER_SHARD = 2048  # fixed per-shard work => weak scaling


def run_mesh_bench(n_shards: int, preset: str = "cartpole") -> dict:
    """Measure the distributed superstep on an ``n_shards``-device mesh.

    Assumes the backend is already configured (the --mesh driver spawns this
    in a child with the right XLA flags).  Per-shard env count is fixed so
    the aggregate should scale linearly with N in the ideal case.
    """
    import dataclasses

    import jax
    import numpy as np
    from jax.sharding import Mesh

    from deep_q_learning_tpu.config import cartpole_vector, lunar_per
    from deep_q_learning_tpu.parallel.distributed import build_distributed_superstep
    from deep_q_learning_tpu.parallel.mesh import ENV_AXIS

    devices = jax.devices()
    if len(devices) < n_shards:
        raise RuntimeError(
            f"backend has {len(devices)} devices < {n_shards} shards"
        )
    mesh = Mesh(np.array(devices[:n_shards]), (ENV_AXIS,))
    base = lunar_per() if preset == "lunar" else cartpole_vector()
    cfg = dataclasses.replace(
        base,
        num_envs=_MESH_ENVS_PER_SHARD * n_shards,
        batch_size=max(base.batch_size, 8 * n_shards),
        buffer_capacity=max(1 << 17, _MESH_ENVS_PER_SHARD * n_shards * 32),
    )
    init_runner, superstep, _ = build_distributed_superstep(cfg, mesh)
    runner = init_runner(jax.random.PRNGKey(0))
    step = jax.jit(superstep, donate_argnums=0)

    for _ in range(3):  # compile + buffer fill
        runner, m = step(runner)
    float(m.window_mean)

    steps_per_call = cfg.steps_per_superstep * cfg.num_envs
    best = 0.0
    for _ in range(3):
        n = 10
        t0 = time.perf_counter()
        for _ in range(n):
            runner, m = step(runner)
        float(m.window_mean)
        dt = time.perf_counter() - t0
        best = max(best, n * steps_per_call / dt)
    return {
        "n_shards": n_shards,
        "envs_per_shard": _MESH_ENVS_PER_SHARD,
        "aggregate_steps_per_s": best,
        "per_shard_steps_per_s": best / n_shards,
        "backend": jax.default_backend(),
    }


def _mesh_probe() -> dict:
    """Child: report the default backend and its device count."""
    import jax

    return {"backend": jax.default_backend(), "n_devices": len(jax.devices())}


def _spawn_mesh_child(args: list, cpu_virtual: int = 0, budget: int = 600):
    """Run ``bench.py <args>`` in a child; on ``cpu_virtual`` > 0 force the
    virtual CPU mesh (and disable the axon session registration so the child
    cannot wedge a concurrent TPU job — CLAUDE.md)."""
    env = dict(os.environ)
    if cpu_virtual:
        env["XLA_FLAGS"] = (
            f"--xla_force_host_platform_device_count={cpu_virtual} "
            + env.get("XLA_FLAGS", "")
        )
        env["PALLAS_AXON_POOL_IPS"] = ""
        env["DQL_FORCE_CPU"] = "1"
    try:
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__)] + args,
            capture_output=True,
            text=True,
            timeout=budget,
            env=env,
        )
        for line in out.stdout.splitlines():
            if line.startswith("{"):
                return json.loads(line)
        sys.stderr.write(out.stderr[-2000:] + "\n")
    except (subprocess.TimeoutExpired, Exception) as e:
        sys.stderr.write(f"mesh child {args} failed: {e}\n")
    return None


def mesh_main(shard_counts: list) -> None:
    probe = _spawn_mesh_child(["--mesh-probe"], budget=120)
    use_real = (
        probe is not None
        and probe["backend"] != "cpu"
        and probe["n_devices"] >= max(shard_counts)
    )
    cpu_virtual = 0 if use_real else max(shard_counts)
    results = []
    for n in shard_counts:
        r = _spawn_mesh_child(["--mesh-inner", str(n)], cpu_virtual=cpu_virtual)
        if r is not None:
            results.append(r)
    base = next((r for r in results if r["n_shards"] == 1), None)
    for r in results:
        r["efficiency_vs_1"] = (
            round(
                r["aggregate_steps_per_s"]
                / (r["n_shards"] * base["aggregate_steps_per_s"]),
                3,
            )
            if base
            else None
        )
    out = {
        "metric": "mesh_weak_scaling",
        "backend": "real" if use_real else f"cpu_virtual_{cpu_virtual}",
        "envs_per_shard": _MESH_ENVS_PER_SHARD,
        "results": results,
    }
    os.makedirs(os.path.join(_REPO, "artifacts"), exist_ok=True)
    with open(os.path.join(_REPO, "artifacts", "mesh_scaling.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


def main() -> None:
    if os.environ.get("DQL_FORCE_CPU"):
        import jax

        jax.config.update("jax_platforms", "cpu")
    argv = sys.argv[1:]
    if argv and argv[0] == "--inner":
        # time-boxed child: measure and print the raw info dict
        preset = argv[2] if len(argv) > 2 else "cartpole"
        print(json.dumps(run_bench(int(argv[1]), preset)))
        return
    if argv and argv[0] == "--mesh-probe":
        print(json.dumps(_mesh_probe()))
        return
    if argv and argv[0] == "--mesh-inner":
        r = run_mesh_bench(int(argv[1]))
        r["aggregate_steps_per_s"] = round(r["aggregate_steps_per_s"])
        r["per_shard_steps_per_s"] = round(r["per_shard_steps_per_s"])
        print(json.dumps(r))
        return
    if argv and argv[0] == "--mesh":
        counts = [int(x) for x in argv[1:]] or [1, 2, 4, 8]
        mesh_main(counts)
        return

    info = None
    # large-config attempts, biggest first, then the reliably-fast small one
    for num_envs, budget in ((131072, 420), (16384, 300)):
        info = _timeboxed(num_envs, budget)
        if info is not None:
            break
    if info is None:  # fallback: small config, reliably fast compile
        info = run_bench(4096)

    # second line item: LunarLander (physics + Pallas kernels), 1024 envs —
    # same JSON line so the driver contract (ONE line) holds
    lunar = _timeboxed(1024, 420, "lunar")

    baseline = 1_000_000.0  # BASELINE.json north-star aggregate env-steps/s
    print(
        json.dumps(
            {
                "metric": "env_steps_per_s_training_on",
                "value": round(info["value"]),
                "unit": "env-steps/s",
                "vs_baseline": round(info["value"] / baseline, 3),
                "num_envs": info["num_envs"],
                "aot_warm": info["aot_warm"],
                "lunar_per_1024envs_env_steps_per_s": (
                    round(lunar["value"]) if lunar is not None else None
                ),
                "lunar_num_envs": lunar["num_envs"] if lunar else None,
                "lunar_aot_warm": lunar["aot_warm"] if lunar else None,
            }
        )
    )


if __name__ == "__main__":
    main()
