"""AutoML — hyper-parameter search over the variant grid.

Rebuild of reference AutoML/auto_experiment (cogdl/experiments.py:25-76,302:
optuna ``study.optimize`` maximising the mean val metric over seeds, default
search space incl. layer type for the ``autognn`` meta-model).

optuna is not available in this environment, so the search backend is
pluggable: ``backend="optuna"`` uses it when importable, otherwise a built-in
TPE-lite sampler (``_suggest_tpe``: Parzen density ratio over the past
trials — random for the first ``n_startup`` trials, then candidates drawn
from the good-quantile density and ranked by l(x)/g(x)) runs the identical
protocol (sample → train over seeds → mean val metric → keep best).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, List, Optional, Sequence

import numpy as np

DEFAULT_SEARCH_SPACE = {
    # (reference default_search_space, experiments.py:319)
    "lr": ("loguniform", 1e-4, 1e-1),
    "hidden_size": ("categorical", [32, 64, 128]),
    "dropout": ("uniform", 0.2, 0.7),
    "weight_decay": ("loguniform", 1e-6, 1e-2),
}


def _sample(space: Dict, rng: np.random.Generator) -> Dict[str, Any]:
    out = {}
    for k, spec in space.items():
        kind = spec[0]
        if kind == "categorical":
            out[k] = spec[1][rng.integers(0, len(spec[1]))]
        elif kind == "uniform":
            out[k] = float(rng.uniform(spec[1], spec[2]))
        elif kind == "loguniform":
            out[k] = float(np.exp(rng.uniform(np.log(spec[1]), np.log(spec[2]))))
        elif kind == "int":
            out[k] = int(rng.integers(spec[1], spec[2] + 1))
        else:
            raise ValueError(f"unknown space kind {kind}")
    return out


def _to_unit(spec, v) -> float:
    """Map a numeric parameter into its search-space coordinate (log space
    for loguniform) so one bandwidth rule covers every kind."""
    kind = spec[0]
    if kind == "loguniform":
        return float(np.log(v))
    return float(v)


def _numeric_bounds(spec):
    kind = spec[0]
    lo, hi = spec[1], spec[2]
    if kind == "loguniform":
        return float(np.log(lo)), float(np.log(hi))
    return float(lo), float(hi)


def _from_unit(spec, u):
    kind = spec[0]
    lo, hi = _numeric_bounds(spec)
    u = float(np.clip(u, lo, hi))
    if kind == "loguniform":
        # exp(log(hi)) can exceed hi by 1 ulp — clip in the original domain
        return float(min(max(np.exp(u), spec[1]), spec[2]))
    if kind == "int":
        return int(round(u))
    return float(u)


def _parzen_logpdf(x: float, centers: np.ndarray, bw: float) -> float:
    """log of a Gaussian-mixture density with one component per past trial
    (the 1-D Parzen estimator TPE uses per dimension)."""
    z = (x - centers) / bw
    lp = -0.5 * z * z - np.log(bw * np.sqrt(2 * np.pi))
    m = lp.max()
    return float(m + np.log(np.mean(np.exp(lp - m))))


def _suggest_tpe(space: Dict, history: List, rng: np.random.Generator,
                 gamma: float = 0.25, n_candidates: int = 24) -> Dict[str, Any]:
    """TPE-lite: split past ``(params, value)`` trials at the γ-quantile,
    fit per-dimension Parzen densities l(x) (good) and g(x) (bad), draw
    candidates from l and return the one maximising Σ log l − log g.
    Mirrors optuna's TPESampler shape (reference experiments.py:25-76 uses
    optuna's study.optimize) without the dependency."""
    order = sorted(history, key=lambda t: -t[1])
    n_good = max(1, int(np.ceil(gamma * len(order))))
    good = [t[0] for t in order[:n_good]]
    bad = [t[0] for t in order[n_good:]] or good

    best_cand, best_score = None, -np.inf
    for _ in range(n_candidates):
        cand, score = {}, 0.0
        for k, spec in space.items():
            kind = spec[0]
            if kind == "categorical":
                cats = spec[1]
                idx = {c: i for i, c in enumerate(cats)}
                cg = np.ones(len(cats))
                for p in good:
                    cg[idx[p[k]]] += 1
                cb = np.ones(len(cats))
                for p in bad:
                    cb[idx[p[k]]] += 1
                pg, pb = cg / cg.sum(), cb / cb.sum()
                i = int(rng.choice(len(cats), p=pg))
                cand[k] = cats[i]
                score += float(np.log(pg[i]) - np.log(pb[i]))
            else:
                lo, hi = _numeric_bounds(spec)
                bw = max((hi - lo) / max(np.sqrt(len(good)), 1.0), 1e-12)
                cg = np.array([_to_unit(spec, p[k]) for p in good])
                cb = np.array([_to_unit(spec, p[k]) for p in bad])
                u = float(np.clip(cg[rng.integers(len(cg))]
                                  + bw * rng.standard_normal(), lo, hi))
                cand[k] = _from_unit(spec, u)
                score += (_parzen_logpdf(u, cg, bw)
                          - _parzen_logpdf(u, cb, bw))
        if score > best_score:
            best_cand, best_score = cand, score
    return best_cand


class AutoML:
    """Search driver (reference AutoML, experiments.py:25)."""

    def __init__(self, dataset, model, seeds: Sequence[int] = (0,),
                 search_space: Optional[Dict] = None, n_trials: int = 10,
                 metric: str = "val_acc", backend: str = "auto", **fixed):
        self.dataset = dataset
        self.model = model
        self.seeds = list(seeds)
        self.space = search_space or DEFAULT_SEARCH_SPACE
        self.n_trials = n_trials
        self.metric = metric
        self.fixed = fixed
        self.backend = backend
        self.best_params: Optional[Dict] = None
        self.best_value = -np.inf
        self.best_results: Optional[List[Dict]] = None

    def _objective(self, params: Dict) -> float:
        from .experiments import train

        results = []
        for seed in self.seeds:
            kw = {**self.fixed, **params}
            results.append(train(self.dataset, self.model, seed=seed, **kw))
        vals = [r.get(self.metric, r.get("val_acc", 0.0)) for r in results]
        value = float(np.mean(vals))
        if value > self.best_value:
            self.best_value = value
            self.best_params = params
            self.best_results = results
        return value

    def run(self) -> Dict[str, Any]:
        use_optuna = False
        if self.backend in ("auto", "optuna"):
            try:
                import optuna

                # a module named optuna is not enough (test harnesses stub
                # missing packages) — require the API we actually call
                use_optuna = callable(getattr(optuna, "create_study", None))
            except ImportError:
                use_optuna = False
            if self.backend == "optuna" and not use_optuna:
                raise ImportError("optuna backend requested but not usable")
        if use_optuna:
            import optuna

            def obj(trial):
                params = {}
                for k, spec in self.space.items():
                    kind = spec[0]
                    if kind == "categorical":
                        params[k] = trial.suggest_categorical(k, spec[1])
                    elif kind == "uniform":
                        params[k] = trial.suggest_float(k, spec[1], spec[2])
                    elif kind == "loguniform":
                        params[k] = trial.suggest_float(k, spec[1], spec[2],
                                                        log=True)
                    elif kind == "int":
                        params[k] = trial.suggest_int(k, spec[1], spec[2])
                return self._objective(params)

            study = optuna.create_study(direction="maximize")
            study.optimize(obj, n_trials=self.n_trials)
        else:
            rng = np.random.default_rng(0)
            n_startup = min(max(4, self.n_trials // 4), self.n_trials)
            history: List = []
            start_t = 0
            # vmapped startup (r5): when the space varies only optimizer
            # hypers, ALL random-startup trials × seeds train as ONE
            # vmapped program (trainer/vmap_seeds.run_grid) — the TPE
            # refinement stays sequential (it conditions on history)
            if set(self.space) <= {"lr", "weight_decay"}:
                try:
                    from .experiments import train_grid_vmapped

                    startup = [_sample(self.space, rng)
                               for _ in range(n_startup)]
                    configs = [{**p, "seed": int(s)}
                               for p in startup for s in self.seeds]
                    res = train_grid_vmapped(self.dataset, self.model,
                                             configs, **self.fixed)
                    k = len(self.seeds)
                    for i, p in enumerate(startup):
                        rs = res[i * k:(i + 1) * k]
                        vals = [r.get(self.metric, r.get("val_acc", 0.0))
                                for r in rs]
                        v = float(np.mean(vals))
                        history.append((p, v))
                        if v > self.best_value:
                            self.best_value = v
                            self.best_params = p
                            self.best_results = rs
                    start_t = n_startup
                except ValueError:
                    # wrapper/config not vmappable — sequential fallback
                    start_t = 0
                    history = []
            for t in range(start_t, self.n_trials):
                if t < n_startup:
                    params = _sample(self.space, rng)
                else:
                    params = _suggest_tpe(self.space, history, rng)
                history.append((params, self._objective(params)))
        return {
            "best_params": self.best_params,
            "best_value": self.best_value,
            "results": self.best_results,
        }


def auto_experiment(dataset, model, seeds=(0,), search_space=None,
                    n_trials: int = 10, **kwargs):
    """reference auto_experiment (experiments.py:302)."""
    out = AutoML(dataset, model, seeds=seeds, search_space=search_space,
                 n_trials=n_trials, **kwargs).run()
    print(f"AutoML best {out['best_value']:.4f} with {out['best_params']}")
    return out
