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
from typing import Callable, Dict, List, Optional, Sequence, Tuple

import numpy as np


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
    from deep_q_learning_tpu.train import Trainer

    trainers: Dict[object, object] = {}

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
        if cfg not in trainers:
            trainers[cfg] = Trainer(cfg)
        tr = trainers[cfg]
        tr.init()  # fresh params/buffer/counters; compiled superstep reused
        if dynamic:
            tr.set_hyper(**dynamic)
        tr.train(max_env_steps=env_steps_per_trial, verbose=False)
        rets, _ = tr.evaluate(seed=eval_seed)
        return float(np.mean(rets))

    return objective
