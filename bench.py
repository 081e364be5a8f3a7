"""Benchmark: aggregate env-steps/s with full training enabled.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N, ...}

Workload: BASELINE.json config 2 (CartPole vanilla DQN on vectorized pure-JAX
envs) with the learner ON (train_every=1, batch 512): every counted env step
comes from the full actor+replay+update superstep.  The instance count
defaults to 131072 — measured single-chip sweep (artifacts/
throughput_sweep.json, r5 slot-major refresh): 27.9M steps/s at 4096 envs,
100M at 16384, 235M at 65536, 301M at 131072 (the peak; 262144 dips to
~276M).  r1-r4's much lower curve (4.1M@4096, 71.8M@131072) was dominated
by per-frame XLA layout-conversion copies of the replay ring — see the
layout note in replay/uniform.py.

``vs_baseline`` compares against the 1M env-steps/s north-star aggregate
target from BASELINE.json (the reference publishes no throughput numbers —
its host loop steps ONE Gym env at a time; SURVEY.md §6).

Self-describing (VERDICT r2 weak #3 / item 7): the JSON line carries
``num_envs`` (which config actually produced the headline number) and
``aot_warm`` (did the measurement hit the on-disk executable cache), so a
time-box fallback can never masquerade as the headline config.

Robustness (r4, VERDICT r3 item 1 — warm-then-measure): for each headline
config a warm child with a 900s budget populates the on-disk AOT executable
cache (utils/aot.py) and proves ONE real execution completes (the remote
service stalls the first execution of a new executable for minutes —
compile itself is seconds), then a 420s timed child measures against the
warm cache; a service-health probe (steady-dispatch timing) is reported in
the JSON line so a sick service day is distinguishable from a regression.
Timing is against host-side scalar fetches (the tunnel's dispatch queue is
async; see .claude/skills/verify).

Mesh scaling mode (VERDICT r2 item 6 — the harness that produces the
BASELINE ">=80% scaling efficiency" number the day multi-chip hardware
appears):

    python bench.py --mesh            # weak-scaling sweep N in {1,2,4,8}
    python bench.py --mesh 1 2 4      # explicit shard counts
    python bench.py --mesh --lunar    # physics+PER program instead of cartpole

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
    elif preset == "lunar_jointed":
        # the FIDELITY engine on the scoreboard (VERDICT r3 item 3): the
        # Box2D-exact 3-body jointed assembly (envs/lander_solver.py)
        from deep_q_learning_tpu.config import lunar_jointed_scaled

        cfg = lunar_jointed_scaled(num_envs)
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
    runner = jax.jit(init_runner)(jax.random.PRNGKey(0))  # jitted: eager init is minutes of small dispatches over the tunnel
    from deep_q_learning_tpu.utils import aot

    jitted = jax.jit(superstep, donate_argnums=0)
    salt = aot.config_salt(cfg)
    cache_path, aot_warm = aot.cache_info(jitted, runner, cache_dir=_AOT_DIR, salt=salt)
    step = aot.load_or_compile(jitted, runner, cache_dir=_AOT_DIR, salt=salt)

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
        "cache_path": cache_path,
        "backend": jax.default_backend(),
    }


def _timeboxed(num_envs: int, budget: int, preset: str = "cartpole", mode: str = "--inner"):
    """Run one measurement in a time-boxed child (remote-compile variance
    must not blow the caller's budget; the on-disk executable cache makes
    reruns immune to it).  Returns the child's info dict or None."""
    # Benchmark PRNG: the hardware rbg generator (DQL_PRNG=rbg, package
    # __init__) is the throughput configuration — threefry's software cipher
    # costs ~70 us/frame at the 131072-env headline (344M -> 417M steps/s).
    # Training still solves under it (lunar_per 209 @5.4M steps, jointed
    # 212 @3.8M, validated on the chip); the library DEFAULT stays threefry
    # for stream compatibility.  Must be in the child env before interpreter
    # start; caller's explicit DQL_PRNG wins.
    env = dict(os.environ)
    env.setdefault("DQL_PRNG", "rbg")
    try:
        out = subprocess.run(
            [
                sys.executable,
                os.path.abspath(__file__),
                mode,
                str(num_envs),
                preset,
            ],
            capture_output=True,
            text=True,
            timeout=budget,
            env=env,
        )
        for line in out.stdout.splitlines():
            if line.startswith("{"):
                return json.loads(line)
        sys.stderr.write(out.stderr[-1500:] + "\n")
    except subprocess.TimeoutExpired:
        sys.stderr.write(f"bench child {mode} {num_envs} {preset}: timeout {budget}s\n")
    except Exception as e:
        sys.stderr.write(f"bench child {mode} {num_envs} {preset}: {e}\n")
    return None


def warm_bench(num_envs: int, preset: str) -> dict:
    """Warm-up child: populate the AOT executable cache for one bench config
    and verify ONE real execution completes.  Printed dict reports whether
    the cache was already warm.  This is the mandatory pre-step of the
    warm-then-measure protocol (VERDICT r3 item 1: a cold remote compile —
    or a server-side first-execution stall — must never eat the timed
    child's budget)."""
    import dataclasses

    import jax

    from deep_q_learning_tpu.config import cartpole_vector, lunar_per_scaled
    from deep_q_learning_tpu.envs import VectorEnv, make_env
    from deep_q_learning_tpu.models import QNetwork
    from deep_q_learning_tpu.replay import make_replay
    from deep_q_learning_tpu.algos import build_superstep, make_optimizer
    from deep_q_learning_tpu.utils import aot

    if preset == "lunar":
        cfg = lunar_per_scaled(num_envs)
    elif preset == "lunar_jointed":
        from deep_q_learning_tpu.config import lunar_jointed_scaled

        cfg = lunar_jointed_scaled(num_envs)
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
    runner = jax.jit(init_runner)(jax.random.PRNGKey(0))  # jitted: eager init is minutes of small dispatches over the tunnel
    jitted = jax.jit(superstep, donate_argnums=0)
    salt = aot.config_salt(cfg)
    cache_path, was_warm = aot.cache_info(jitted, runner, cache_dir=_AOT_DIR, salt=salt)
    t0 = time.perf_counter()
    step = aot.load_or_compile(jitted, runner, cache_dir=_AOT_DIR, salt=salt)
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    runner, m = step(runner)
    float(m.window_mean)  # host fetch: proves remote execution completed
    exec_s = time.perf_counter() - t0
    return {
        "warmed": True,
        "was_warm": was_warm,
        "compile_s": round(compile_s, 1),
        "first_exec_s": round(exec_s, 1),
        "preset": preset,
        "num_envs": num_envs,
        "cache_path": cache_path,
    }


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
    # NOT jitted: the distributed init scatters per-shard keys host-side
    # (numpy split), which is untraceable; it runs once and is cheap on the
    # CPU mesh (the eager-init cost note applies to the single-chip path)
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
    """Child: report the default backend and its device count.  When the
    axon plugin is registration-disabled but still listed in jax_platforms
    (PALLAS_AXON_POOL_IPS= in the parent env — CLAUDE.md), backend init
    raises; report cpu so the sweep falls back to the virtual CPU mesh."""
    import jax

    try:
        return {"backend": jax.default_backend(), "n_devices": len(jax.devices())}
    except RuntimeError:
        jax.config.update("jax_platforms", "cpu")
        return {"backend": "cpu", "n_devices": len(jax.devices())}


def _health_probe() -> dict:
    """Child: two trivial matmul round-trips; healthy iff the SECOND is
    fast (the first pays one-time session init ~20-30s even when the
    service is fine; a sick service is slow on every dispatch or wedges
    first executions indefinitely — see CLAUDE.md)."""
    import jax
    import jax.numpy as jnp

    x = jnp.ones((1024, 1024))
    float((x @ x).sum())  # session init + compile
    t0 = time.perf_counter()
    float((x @ (x + 1.0)).sum())
    dt = time.perf_counter() - t0
    return {
        "healthy": dt < 15.0,
        "probe_s": round(dt, 1),
        "backend": jax.default_backend(),
    }


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


def mesh_main(shard_counts: list, preset: str = "cartpole") -> None:
    probe = _spawn_mesh_child(["--mesh-probe"], budget=120)
    use_real = (
        probe is not None
        and probe["backend"] != "cpu"
        and probe["n_devices"] >= max(shard_counts)
    )
    cpu_virtual = 0 if use_real else max(shard_counts)
    results = []
    for n in shard_counts:
        r = _spawn_mesh_child(
            ["--mesh-inner", str(n), preset], cpu_virtual=cpu_virtual
        )
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
        "preset": preset,
        "envs_per_shard": _MESH_ENVS_PER_SHARD,
        "results": results,
        "caveat": None
        if use_real
        else (
            "virtual CPU mesh: all shards share one host's cores, so "
            "efficiency(N) is core-contention-bound and is a LOWER bound "
            "on ICI-mesh efficiency; the mesh PROGRAM (shard_map + psum) "
            "is what this validates, not hardware scaling"
        ),
    }
    os.makedirs(os.path.join(_REPO, "artifacts"), exist_ok=True)
    name = (
        "mesh_scaling.json" if preset == "cartpole" else f"mesh_scaling_{preset}.json"
    )
    with open(os.path.join(_REPO, "artifacts", name), "w") as f:
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
    if argv and argv[0] == "--warm":
        preset = argv[2] if len(argv) > 2 else "cartpole"
        print(json.dumps(warm_bench(int(argv[1]), preset)))
        return
    if argv and argv[0] == "--health":
        print(json.dumps(_health_probe()))
        return
    if argv and argv[0] == "--mesh-probe":
        print(json.dumps(_mesh_probe()))
        return
    if argv and argv[0] == "--mesh-inner":
        preset = argv[2] if len(argv) > 2 else "cartpole"
        r = run_mesh_bench(int(argv[1]), preset)
        r["aggregate_steps_per_s"] = round(r["aggregate_steps_per_s"])
        r["per_shard_steps_per_s"] = round(r["per_shard_steps_per_s"])
        print(json.dumps(r))
        return
    if argv and argv[0] == "--mesh":
        counts = [int(x) for x in argv[1:] if not x.startswith("--")] or [1, 2, 4, 8]
        preset = "lunar" if "--lunar" in argv else "cartpole"
        mesh_main(counts, preset)
        return

    # service-health probe: the remote TPU service occasionally degrades to
    # minute-scale latencies for EVERY dispatch (observed round 4: a 1k
    # matmul taking 36-60s).  A sick service makes every number below
    # meaningless, so measure and report it rather than letting a bad day
    # masquerade as a regression.
    health = _timeboxed(0, 300, mode="--health") or {"healthy": None, "probe_s": None}

    # Warm-then-measure protocol (VERDICT r3 item 1): for every headline
    # config, a warm child with a LONG budget first populates the AOT
    # executable cache and proves one real execution completes, then the
    # timed child measures against the warm cache.  One retry each: a
    # transient server-side stall must not null a line.
    #
    # Health-aware budgets (ADVICE r4): when the probe timed out or reported
    # unhealthy, a wedged service would otherwise serially burn
    # (900+900+420+420)s per config (~2h total) before printing nulls —
    # shrink the budgets and drop the retries instead, and carry the warm
    # child's compile/first-exec diagnostics into the final JSON line so
    # stall-vs-regression is diagnosable from the artifact.
    service_ok = health.get("healthy") is True
    warm_budget = 900 if service_ok else 300
    warm_diag = {}

    def warm_then_measure(num_envs: int, preset: str, measure_budget: int = 420):
        if not service_ok:
            measure_budget = min(measure_budget, 240)
        warm = _timeboxed(num_envs, warm_budget, preset, mode="--warm")
        if warm is None and service_ok:  # one retry (stall/cold overrun)
            warm = _timeboxed(num_envs, warm_budget, preset, mode="--warm")
        warm_diag[f"{preset}@{num_envs}"] = (
            {k: warm.get(k) for k in ("was_warm", "compile_s", "first_exec_s")}
            if warm is not None
            else {"warm_child": "timeout_or_failed", "budget_s": warm_budget}
        )
        result = _timeboxed(num_envs, measure_budget, preset)
        if result is None and service_ok:
            result = _timeboxed(num_envs, measure_budget, preset)
        if result is not None and not result.get("aot_warm", False):
            # fail loudly: a cold-cache measurement must never be recorded
            # as the headline (it would demote silently under the time-box)
            sys.stderr.write(
                f"WARNING: {preset}@{num_envs} measured with aot_warm=false\n"
            )
        return result

    # cartpole headline, biggest config first with a warmed cache, then the
    # reliably-fast fallbacks
    info = warm_then_measure(131072, "cartpole")
    if info is None:
        info = _timeboxed(16384, 300)
    if info is None:  # fallback: small config, reliably fast compile
        info = run_bench(4096)

    lunar = warm_then_measure(1024, "lunar")
    jointed = warm_then_measure(1024, "lunar_jointed")
    # the fidelity engine at scale (r5: slot-major storage removed the old
    # ~0.9M plateau — the Box2D-exact program now scales past 8M steps/s)
    jointed4k = warm_then_measure(4096, "lunar_jointed")

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
                "service_healthy": health.get("healthy"),
                "service_probe_s": health.get("probe_s"),
                "lunar_per_1024envs_env_steps_per_s": (
                    round(lunar["value"]) if lunar is not None else None
                ),
                "lunar_num_envs": lunar["num_envs"] if lunar else None,
                "lunar_aot_warm": lunar["aot_warm"] if lunar else None,
                "lunar_jointed_1024envs_env_steps_per_s": (
                    round(jointed["value"]) if jointed is not None else None
                ),
                "lunar_jointed_aot_warm": jointed["aot_warm"] if jointed else None,
                "lunar_jointed_4096envs_env_steps_per_s": (
                    round(jointed4k["value"]) if jointed4k is not None else None
                ),
                "lunar_jointed_4096_aot_warm": (
                    jointed4k["aot_warm"] if jointed4k else None
                ),
                "warm_diagnostics": warm_diag,
            }
        )
    )


if __name__ == "__main__":
    main()
