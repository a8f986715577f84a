"""Round-2 components: GNN KG link prediction (scoring parity + learning),
GCC MoCo pretraining, GraphSAINT estimator, GCN propagation cache."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cogdl_tpu.data.graph import add_self_loops, sym_norm
from cogdl_tpu.datasets.synthetic import powerlaw_graph, random_triples, sbm_graph
from cogdl_tpu.experiments import train
from cogdl_tpu.models import build_model
from cogdl_tpu.ops import cache_propagation, spmm
from cogdl_tpu.utils.evaluator import masked_cross_entropy


# ---------------------------------------------------------------------------
# KG link prediction
# ---------------------------------------------------------------------------

def test_distmult_scoring_parity_vs_reference():
    """Our DistMult + raw ranking match the reference's scoring exactly."""
    torch = pytest.importorskip("torch")
    from test_reference_parity import _import_reference
    _import_reference()
    from cogdl.utils.link_prediction_utils import DistMultLayer

    rng = np.random.default_rng(0)
    B, N, d = 7, 23, 16
    sub = rng.normal(size=(B, d)).astype(np.float32)
    rel = rng.normal(size=(B, d)).astype(np.float32)
    obj = rng.normal(size=(B, d)).astype(np.float32)
    allo = rng.normal(size=(N, d)).astype(np.float32)

    ref = DistMultLayer()
    r_score = ref(torch.tensor(sub), torch.tensor(obj),
                  torch.tensor(rel)).numpy()
    r_all = ref.predict(torch.tensor(sub), torch.tensor(allo),
                        torch.tensor(rel)).numpy()

    from cogdl_tpu.models.nn.kg_gnn import DistMult

    dm = DistMult()
    ours = np.asarray(dm.apply({}, jnp.asarray(sub), jnp.asarray(rel),
                               jnp.asarray(obj)))
    ours_all = np.asarray(dm.apply({}, jnp.asarray(sub), jnp.asarray(rel),
                                   jnp.asarray(allo), all_entities=True))
    np.testing.assert_allclose(ours, r_score, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(ours_all, r_all, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("model", ["compgcn", "rgcn"])
def test_kg_link_prediction_learns(model):
    """CompGCN/RGCN + DistMult learn the rule-structured KG essentially
    perfectly (random-ranking MRR ≈ 0.03 at N=200; both models measured at
    MRR 1.0 with these settings)."""
    res = train("random-kg", model, wrapper="kg_link_prediction",
                epochs=250, eval_every=125, patience=400, hidden_size=64,
                lr=0.01)
    assert res["val_mrr"] > 0.5, res
    assert res["test_hits10"] > 0.5, res


def test_kg_conve_scorer_runs():
    from cogdl_tpu.datasets.dataset import Dataset

    ds = Dataset.from_triples(random_triples(num_entities=48, num_relations=4,
                                             num_triples=300), name="kg48")
    res = train(ds, "compgcn", wrapper="kg_link_prediction",
                epochs=3, eval_every=3, patience=10, hidden_size=40,
                score_func="conve")
    assert 0.0 <= res["val_mrr"] <= 1.0


# ---------------------------------------------------------------------------
# GCC pretraining (MoCo queue + RWR pairs + frozen probe)
# ---------------------------------------------------------------------------

def test_gcc_pretraining_probe_beats_majority():
    res = train("sbm", "gcc", epochs=10, eval_every=10, patience=20,
                batch_size=16, subgraph_size=24, rw_hops=48, queue_size=128,
                batches_per_epoch=4, probe_nodes=300)
    # SBM: 4 balanced blocks → majority class = 0.25; structural RWR
    # subgraphs separate blocks well above chance
    assert res["val_acc"] > 0.3, res


def test_gcc_moco_state_updates():
    """Queue pointer advances and key params EMA-track the query params."""
    from cogdl_tpu.wrappers import fetch_wrapper

    g = sbm_graph(num_nodes=120, num_classes=3, feat_dim=8, seed=0)
    model = build_model("gcc", in_features=8, out_features=16,
                        hidden_size=16, num_layers=2)
    w = fetch_wrapper("gcc")(model, None, batch_size=4, subgraph_size=8,
                             rw_hops=12, queue_size=16, batches_per_epoch=1,
                             momentum=0.9)
    g = w.prepare_graph(g)
    rng = jax.random.PRNGKey(0)
    variables = w.init(rng, g)
    batch = w.train_batches(g)[0]
    loss, upd = w.loss(variables, batch, rng)
    assert np.isfinite(float(loss))
    assert int(upd["moco"]["ptr"]) == 4
    # EMA moved toward params but not onto them (some leaf changed)
    diffs = jax.tree.map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))),
        variables["moco"]["key_params"], upd["moco"]["key_params"])
    assert max(jax.tree_util.tree_leaves(diffs)) > 0.0


# ---------------------------------------------------------------------------
# GraphSAINT estimator
# ---------------------------------------------------------------------------

def test_graphsaint_trains_sbm():
    res = train("sbm", "graphsaint", epochs=10, eval_every=5, patience=20,
                sampler="node", sample_size=250, batches_per_epoch=3,
                est_samples=12, hidden_size=32)
    assert res["test_acc"] > 0.5, res


def test_graphsaint_aggr_estimator_unbiased():
    """E[Ã x] over subgraph draws ≈ A x on sampled nodes (the SAINT
    norm_aggr guarantee), within Monte-Carlo tolerance."""
    from cogdl_tpu.wrappers import fetch_wrapper

    g = sym_norm(add_self_loops(sbm_graph(num_nodes=150, num_classes=3,
                                          feat_dim=4, seed=1)))
    model = build_model("graphsaint", in_features=4, out_features=3,
                        hidden_size=8)
    w = fetch_wrapper("graphsaint")(model, None, sampler="node",
                                    sample_size=100, est_samples=400, seed=3)
    g2 = w.prepare_graph(g)
    x = np.asarray(g2.x)[: g2.num_nodes, :1]
    full = np.zeros((g2.num_nodes, 1))
    E = g2.num_edges
    row = np.asarray(g2.row)[:E]
    col = np.asarray(g2.col)[:E]
    wgt = np.asarray(g2.edge_weight)[:E]
    np.add.at(full, row, wgt[:, None] * x[col])

    rng = np.random.default_rng(7)
    acc = np.zeros_like(full)
    cnt = np.zeros((g2.num_nodes, 1))
    draws = 600
    for _ in range(draws):
        nodes = w._draw(g2, rng)
        sel = np.zeros(g2.num_nodes, bool)
        sel[nodes] = True
        em = sel[row] & sel[col]
        ws = wgt[em] * w._norm_aggr[em]
        part = np.zeros_like(full)
        np.add.at(part, row[em], ws[:, None] * x[col[em]])
        acc[nodes] += part[nodes]
        cnt[nodes] += 1
    est = acc / np.maximum(cnt, 1)
    # compare on well-sampled nodes only
    m = (cnt[:, 0] > draws * 0.3) & (np.abs(full[:, 0]) > 0.05)
    assert m.sum() > 20
    rel_err = np.abs(est[m, 0] - full[m, 0]) / np.abs(full[m, 0])
    assert np.median(rel_err) < 0.25, float(np.median(rel_err))


# ---------------------------------------------------------------------------
# GCN propagation cache (exact first-layer folding)
# ---------------------------------------------------------------------------

def test_prop_cache_exact_loss_and_grads():
    g = sym_norm(add_self_loops(powerlaw_graph(400, avg_degree=8,
                                               feat_dim=24)))
    gc = cache_propagation(g)
    model = build_model("gcn", in_features=24, out_features=g.num_classes,
                        hidden_size=32, dropout=0.0)
    v = model.init(jax.random.PRNGKey(0), g, g.x, training=False)

    def loss(p, graph):
        logits = model.apply({"params": p}, graph, graph.x, training=True,
                             rngs={"dropout": jax.random.PRNGKey(1)})
        return masked_cross_entropy(logits, graph.y,
                                    graph.train_mask & graph.node_mask())

    l0, g0 = jax.value_and_grad(loss)(v["params"], g)
    l1, g1 = jax.value_and_grad(loss)(v["params"], gc)
    assert abs(float(l0) - float(l1)) < 1e-5
    for a, b in zip(jax.tree_util.tree_leaves(g0),
                    jax.tree_util.tree_leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_prop_cache_matches_spmm_product():
    g = sym_norm(add_self_loops(powerlaw_graph(300, avg_degree=6,
                                               feat_dim=12)))
    gc = cache_propagation(g)
    np.testing.assert_allclose(np.asarray(gc.extras["prop_x"]),
                               np.asarray(spmm(g, g.x)), atol=1e-6)


def test_prop_cache_disabled_under_dropout():
    """With input dropout active in training, the cache must NOT be used
    (folding would be inexact) — training losses must match the uncached
    model exactly under the same rng."""
    g = sym_norm(add_self_loops(powerlaw_graph(200, avg_degree=6,
                                               feat_dim=12)))
    gc = cache_propagation(g)
    model = build_model("gcn", in_features=12, out_features=g.num_classes,
                        hidden_size=16, dropout=0.5)
    v = model.init(jax.random.PRNGKey(0), g, g.x, training=False)
    r = jax.random.PRNGKey(3)
    a = model.apply({"params": v["params"]}, g, g.x, training=True,
                    rngs={"dropout": r})
    b = model.apply({"params": v["params"]}, gc, gc.x, training=True,
                    rngs={"dropout": r})
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


# ---------------------------------------------------------------------------
# ActNN-equivalent int8 activation compression
# ---------------------------------------------------------------------------

def test_actnn_compressed_gradients():
    """act_dense: dx/db EXACT (use w and g only), dw within int8-rowwise
    quantisation noise; act_relu mask-only backward exact."""
    from cogdl_tpu.ops.actnn import act_dense, act_relu

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(50, 16)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(16, 8)).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(8,)).astype(np.float32))
    g = jnp.asarray(rng.normal(size=(50, 8)).astype(np.float32))
    exact = jax.grad(lambda x, w, b: jnp.sum((x @ w + b) * g),
                     argnums=(0, 1, 2))(x, w, b)
    comp = jax.grad(lambda x, w, b: jnp.sum(act_dense(x, w, b) * g),
                    argnums=(0, 1, 2))(x, w, b)
    np.testing.assert_allclose(comp[0], exact[0], atol=0)      # dx exact
    np.testing.assert_allclose(comp[2], exact[2], atol=0)      # db exact
    rel = float(jnp.max(jnp.abs(exact[1] - comp[1]))
                / jnp.max(jnp.abs(exact[1])))
    assert rel < 0.02, rel                                     # dw ~int8 noise

    dr = jax.grad(lambda x: jnp.sum(act_relu(x) * g))(x @ w + b)
    de = jax.grad(lambda x: jnp.sum(jnp.maximum(x, 0) * g))(x @ w + b)
    np.testing.assert_allclose(dr, de, atol=0)


def test_actgcn_trains():
    res = train("sbm", "actgcn", epochs=20, eval_every=10, patience=30,
                hidden_size=32)
    assert res["test_acc"] > 0.8, res
