"""AutoML — hyper-parameter search over the variant grid.

Rebuild of reference AutoML/auto_experiment (cogdl/experiments.py:25-76,302:
optuna ``study.optimize`` maximising the mean val metric over seeds, default
search space incl. layer type for the ``autognn`` meta-model).

optuna is not available in this environment, so the search backend is
pluggable: ``backend="optuna"`` uses it when importable, otherwise a built-in
random/TPE-lite sampler runs the identical protocol (sample → train over
seeds → mean val metric → keep best).
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
            for _ in range(self.n_trials):
                self._objective(_sample(self.space, rng))
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
