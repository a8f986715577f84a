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


# ---------------------------------------------------------------------------
# Graph reordering (data/graph.py reorder)
# ---------------------------------------------------------------------------

def _toy_graph(n=60, seed=3):
    from cogdl_tpu.data.graph import add_self_loops, sym_norm
    from cogdl_tpu.datasets.synthetic import sbm_graph

    return sym_norm(add_self_loops(sbm_graph(num_nodes=n, seed=seed)))


@pytest.mark.parametrize("method", ["degree", "bfs", "rcm", "random"])
def test_reorder_preserves_model_output(method):
    import jax.numpy as jnp

    from cogdl_tpu.data.graph import reorder
    from cogdl_tpu.models import build_model

    g = _toy_graph()
    g2 = reorder(g, method)
    assert g2.num_nodes == g.num_nodes and g2.num_edges == g.num_edges
    orig = np.asarray(g2.extras["reorder_orig"])[: g.num_nodes]
    assert sorted(orig.tolist()) == list(range(g.num_nodes))
    # node data followed the permutation
    np.testing.assert_array_equal(
        np.asarray(g2.y)[: g.num_nodes], np.asarray(g.y)[orig])
    np.testing.assert_array_equal(
        np.asarray(g2.train_mask)[: g.num_nodes],
        np.asarray(g.train_mask)[orig])
    # a deterministic GCN forward is permutation-equivariant: applying the
    # same params to the reordered graph must permute the logits
    import jax

    model = build_model("gcn", in_features=g.num_features,
                        out_features=g.num_classes, hidden_size=16,
                        dropout=0.0)
    variables = model.init(jax.random.PRNGKey(0), g, g.x, training=False)
    out1 = model.apply(variables, g, g.x, training=False)
    out2 = model.apply(variables, g2, g2.x, training=False)
    np.testing.assert_allclose(np.asarray(out2)[: g.num_nodes],
                               np.asarray(out1)[orig], rtol=2e-4, atol=2e-4)


def test_reorder_degree_puts_hubs_first():
    from cogdl_tpu.data.graph import reorder
    from cogdl_tpu.datasets.synthetic import powerlaw_graph

    g = powerlaw_graph(2000, avg_degree=10, feat_dim=8)
    g2 = reorder(reorder(g, "random"), "degree")
    E = g2.num_edges
    row = np.asarray(g2.row)[:E]
    col = np.asarray(g2.col)[:E]
    deg = np.bincount(row, minlength=g2.num_nodes) + np.bincount(
        col, minlength=g2.num_nodes)
    # descending degree (ties broken stably)
    assert np.all(np.diff(deg) <= 0) or np.all(np.sort(deg)[::-1] == deg)


def test_reorder_rcm_reduces_bandwidth():
    from cogdl_tpu.data.graph import reorder

    g = _toy_graph(n=200)
    g_rand = reorder(g, "random")

    def bandwidth(gg):
        E = gg.num_edges
        r = np.asarray(gg.row)[:E].astype(np.int64)
        c = np.asarray(gg.col)[:E].astype(np.int64)
        return float(np.mean(np.abs(r - c)))

    g_rcm = reorder(g_rand, "rcm")
    assert bandwidth(g_rcm) < bandwidth(g_rand)
