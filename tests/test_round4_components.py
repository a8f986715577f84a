"""Round-4 component tests: TPE-lite sampler, halo BFS partitioning,
feature-sharded sampling, comm-volume accounting."""

import numpy as np
import pytest

from cogdl_tpu.automl import DEFAULT_SEARCH_SPACE, _sample, _suggest_tpe


def _toy_surface(params):
    # deterministic response surface with a basin at lr=1e-2, dropout=0.45,
    # hidden_size=64 — smooth in the numeric dims, a bump in the categorical
    v = -((np.log10(params["lr"]) + 2.0) ** 2)
    v -= 4.0 * (params["dropout"] - 0.45) ** 2
    v -= 0.5 * (np.log10(params["weight_decay"]) + 4.0) ** 2
    v += 1.0 if params["hidden_size"] == 64 else 0.0
    return float(v)


def _run(strategy: str, seed: int, n_trials: int = 32, n_startup: int = 8):
    rng = np.random.default_rng(seed)
    history = []
    for t in range(n_trials):
        if strategy == "random" or t < n_startup:
            p = _sample(DEFAULT_SEARCH_SPACE, rng)
        else:
            p = _suggest_tpe(DEFAULT_SEARCH_SPACE, history, rng)
        history.append((p, _toy_surface(p)))
    return max(v for _, v in history)


def test_tpe_beats_random_on_toy_surface():
    seeds = range(5)
    tpe = np.mean([_run("tpe", s) for s in seeds])
    rnd = np.mean([_run("random", s) for s in seeds])
    assert tpe > rnd, (tpe, rnd)


def test_tpe_respects_bounds_and_types():
    rng = np.random.default_rng(0)
    history = [(_sample(DEFAULT_SEARCH_SPACE, rng),
                float(rng.uniform())) for _ in range(6)]
    for _ in range(10):
        p = _suggest_tpe(DEFAULT_SEARCH_SPACE, history, rng)
        assert 1e-4 <= p["lr"] <= 1e-1
        assert 0.2 <= p["dropout"] <= 0.7
        assert 1e-6 <= p["weight_decay"] <= 1e-2
        assert p["hidden_size"] in (32, 64, 128)
        history.append((p, _toy_surface(p)))
