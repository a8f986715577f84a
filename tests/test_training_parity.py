"""End-to-end TRAINING parity and GRADIENT parity against the reference
package (VERDICT r01 #2): real datasets are unreachable offline, but
training-dynamics parity is provable on the same synthetic graph — train the
reference (CPU torch) and cogdl_tpu with identical data, splits and
hyper-parameters and compare where they land; and check the custom-VJP ops
against torch autograd (the reference's backward), not just against jax
autodiff of our own fallback tier."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from test_reference_parity import (  # noqa: E402
    _import_reference, _our_graph, _random_edges, _ref_graph)

try:
    _import_reference()
except Exception as e:  # pragma: no cover
    pytest.skip(f"reference import failed: {e}", allow_module_level=True)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from cogdl_tpu import ops  # noqa: E402
from cogdl_tpu.data.graph import add_self_loops, from_coo, sym_norm  # noqa: E402
from cogdl_tpu.datasets.synthetic import sbm_graph  # noqa: E402
from cogdl_tpu.models import build_model  # noqa: E402
from cogdl_tpu.utils.evaluator import masked_cross_entropy  # noqa: E402


# ---------------------------------------------------------------------------
# Shared data: one SBM graph exported to both frameworks
# ---------------------------------------------------------------------------

def _shared_setup(seed=0):
    g = sbm_graph(num_nodes=300, num_classes=4, feat_dim=16, seed=seed,
                  self_loops=False)
    E = g.num_edges
    row = np.asarray(g.row)[:E]
    col = np.asarray(g.col)[:E]
    x = np.asarray(g.x)[: g.num_nodes]
    y = np.asarray(g.y)[: g.num_nodes]
    masks = {s: np.asarray(getattr(g, f"{s}_mask"))[: g.num_nodes]
             for s in ("train", "val", "test")}
    return g, row, col, x, y, masks


def _train_reference(model, rg, x, y, masks, epochs, lr=1e-2):
    rg.x = torch.tensor(x)
    yt = torch.tensor(y, dtype=torch.long)
    tm = torch.tensor(masks["train"])
    opt = torch.optim.Adam(model.parameters(), lr=lr)
    model.train()
    for _ in range(epochs):
        opt.zero_grad()
        loss = torch.nn.functional.cross_entropy(model(rg)[tm], yt[tm])
        loss.backward()
        opt.step()
    model.eval()
    with torch.no_grad():
        logits = model(rg).numpy()
    pred = logits.argmax(-1)
    return {s: float((pred[m] == y[m]).mean()) for s, m in masks.items()}


def _train_ours(name, g, epochs, lr=1e-2, **kw):
    import optax

    model = build_model(name, in_features=g.num_features,
                        out_features=g.num_classes, **kw)
    rng = jax.random.PRNGKey(0)
    variables = model.init({"params": rng, "dropout": rng}, g, g.x,
                           training=False)
    tx = optax.adam(lr)
    params = variables["params"]
    opt_state = tx.init(params)
    mask = g.train_mask & g.node_mask()

    @jax.jit
    def step(params, opt_state, r):
        def loss_fn(p):
            logits = model.apply({"params": p}, g, g.x, training=True,
                                 rngs={"dropout": r})
            return masked_cross_entropy(logits, g.y, mask)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        upd, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, upd), opt_state, loss

    for i in range(epochs):
        params, opt_state, _ = step(params, opt_state,
                                    jax.random.fold_in(rng, i))
    logits = np.asarray(model.apply({"params": params}, g, g.x,
                                    training=False))
    pred = logits.argmax(-1)
    y = np.asarray(g.y)
    out = {}
    for s in ("train", "val", "test"):
        m = np.asarray(getattr(g, f"{s}_mask") & g.node_mask())
        out[s] = float((pred[m] == y[m]).mean())
    return out


def test_gcn_training_parity():
    """Reference torch GCN and ours land at the same test accuracy when
    trained identically (results.md:52 protocol, in miniature)."""
    from cogdl.models.nn.gcn import GCN as RefGCN

    g, row, col, x, y, masks = _shared_setup(seed=11)
    torch.manual_seed(0)
    ref_model = RefGCN(16, 32, 4, 2, 0.5)
    rg = _ref_graph(row, col, g.num_nodes)
    ref = _train_reference(ref_model, rg, x, y, masks, epochs=150)

    ours = _train_ours("gcn", sym_norm(add_self_loops(g)), epochs=150,
                       hidden_size=32, dropout=0.5)
    assert ours["test"] >= ref["test"] - 0.05, (ours, ref)


def test_gat_training_parity():
    from cogdl.models.nn.gat import GAT as RefGAT

    g, row, col, x, y, masks = _shared_setup(seed=12)
    torch.manual_seed(0)
    ref_model = RefGAT(16, 8, 4, 2, 0.5, 0.0, 0.2, 4, False, 1)
    rg = _ref_graph(row, col, g.num_nodes)
    ref = _train_reference(ref_model, rg, x, y, masks, epochs=120)

    ours = _train_ours("gat", add_self_loops(g), epochs=120,
                       hidden_size=8, nhead=4, dropout=0.5, attn_drop=0.0)
    assert ours["test"] >= ref["test"] - 0.05, (ours, ref)


# ---------------------------------------------------------------------------
# Gradient parity: our VJPs vs torch autograd (the reference's backward)
# ---------------------------------------------------------------------------

def test_spmm_gradient_parity():
    """d/dx and d/dw of sum(spmm(A, x) * G) match torch autograd through the
    reference's spmm (SPMMFunction backward: transpose-spmm + sddmm)."""
    from cogdl.utils.spmm_utils import spmm as ref_spmm

    row, col, n = _random_edges(seed=20)
    rng = np.random.default_rng(21)
    e = row.shape[0]
    w = rng.normal(size=e).astype(np.float32)
    x = rng.normal(size=(n, 8)).astype(np.float32)
    gcot = rng.normal(size=(n, 8)).astype(np.float32)

    xt = torch.tensor(x, requires_grad=True)
    wt = torch.tensor(w, requires_grad=True)
    rg = _ref_graph(row, col, n, None)
    rg.edge_weight = wt
    (ref_spmm(rg, xt) * torch.tensor(gcot)).sum().backward()

    g = _our_graph(row, col, n, w)
    xp = jnp.asarray(np.pad(x, ((0, g.n_pad - n), (0, 0))))
    gp = jnp.asarray(np.pad(gcot, ((0, g.n_pad - n), (0, 0))))

    def loss_x(xx):
        return jnp.sum(ops.spmm(g, xx) * gp)

    dx = np.asarray(jax.grad(loss_x)(xp))[:n]
    np.testing.assert_allclose(dx, xt.grad.numpy(), rtol=1e-4, atol=1e-5)

    def loss_w(ww):
        g2 = g.replace(edge_weight=ww)
        return jnp.sum(ops.spmm(g2, xp) * gp)

    wp = jnp.asarray(np.pad(w, (0, g.e_pad - e)))
    dw = np.asarray(jax.grad(loss_w)(wp))[:e]
    np.testing.assert_allclose(dw, wt.grad.numpy(), rtol=1e-4, atol=1e-5)


def test_edge_softmax_gradient_parity():
    """Our edge_softmax gradient vs the ANALYTIC softmax Jacobian
    (the backward the reference's CUDA op implements,
    edge_softmax.cu:63). Checked against the analytic form rather than
    torch autograd of the reference because the reference's CPU fallback
    (spmm_utils.py:149 ``edge_softmax_val``) has a broken backward — its
    torch.grad deviates from the analytic gradient of its own forward by
    ~0.9 abs on this case (verified while writing this test)."""
    from cogdl.utils.spmm_utils import edge_softmax as ref_es

    row, col, n = _random_edges(seed=22)
    rng = np.random.default_rng(23)
    e = row.shape[0]
    scores = rng.normal(size=(e, 3)).astype(np.float32)
    gcot = rng.normal(size=(e, 3)).astype(np.float32)

    att = ref_es(_ref_graph(row, col, n),
                 torch.tensor(scores)).detach().numpy()
    dman = np.zeros_like(scores)
    for r in np.unique(row):
        m = row == r
        a, gg = att[m], gcot[m]
        dman[m] = a * (gg - (a * gg).sum(0, keepdims=True))

    g = _our_graph(row, col, n)
    sp = jnp.asarray(np.pad(scores, ((0, g.e_pad - e), (0, 0))))
    gp = jnp.asarray(np.pad(gcot, ((0, g.e_pad - e), (0, 0))))

    def loss(ss):
        return jnp.sum(ops.edge_softmax(g, ss) * gp)

    ds = np.asarray(jax.grad(loss)(sp))[:e]
    np.testing.assert_allclose(ds, dman, rtol=1e-4, atol=1e-5)


def test_gat_fused_vjp_vs_torch_autograd():
    """The hand-derived fused-GAT VJP (the riskiest code in the repo)
    against torch autograd of the same attention math — sd, ss-via-a_src,
    and h gradients."""
    from cogdl_tpu.ops.pallas import prepare_spmm
    from cogdl_tpu.ops.pallas.segment_kernels import build_ar, gat_fused

    H, D = 2, 4
    row, col, n = _random_edges(seed=24)
    g = prepare_spmm(sym_norm(_our_graph(row, col, n)))
    rng = np.random.default_rng(25)
    h = rng.normal(size=(g.n_pad, H, D)).astype(np.float32)
    h[n:] = 0
    a_src = rng.normal(size=(H, D)).astype(np.float32)
    a_dst = rng.normal(size=(H, D)).astype(np.float32)
    gcot = rng.normal(size=(g.n_pad, H * D)).astype(np.float32)
    gcot[n:] = 0

    # torch: same math, same edge set
    ht = torch.tensor(h[:n].reshape(n, H, D), requires_grad=True)
    ast = torch.tensor(a_src, requires_grad=True)
    adt = torch.tensor(a_dst, requires_grad=True)
    rt = torch.tensor(np.asarray(g.row)[: g.num_edges].astype(np.int64))
    ct = torch.tensor(np.asarray(g.col)[: g.num_edges].astype(np.int64))
    sd_t = (ht * adt).sum(-1)
    ss_t = (ht * ast).sum(-1)
    e_t = torch.nn.functional.leaky_relu(sd_t[rt] + ss_t[ct], 0.2)
    # per-destination softmax
    att = torch.zeros_like(e_t)
    for hd in range(H):
        m = torch.full((n,), -1e30)
        m = m.scatter_reduce(0, rt, e_t[:, hd], reduce="amax")
        ex = torch.exp(e_t[:, hd] - m[rt])
        den = torch.zeros(n).scatter_add(0, rt, ex)
        att[:, hd] = ex / den[rt]
    agg = torch.zeros(n, H, D)
    agg = agg.index_add(0, rt, att[:, :, None] * ht[ct])
    (agg.reshape(n, H * D) * torch.tensor(gcot[:n])).sum().backward()

    # ours: fused kernel VJP (interpret mode on CPU)
    ex_ = g.extras
    ar = build_ar(jnp.asarray(a_src), H, D)

    def loss(h2, sd, ss):
        out = gat_fused(
            H, D, 0.2, 0.0, sd, ss, h2, ar, jnp.uint32(0),
            ex_["spmm_fw_col"], ex_["spmm_fw_row"], ex_["spmm_fw_ones"],
            ex_["spmm_fw_ct"], ex_["spmm_fw_orig"],
            ex_["spmm_bw_col"], ex_["spmm_bw_row"], ex_["spmm_bw_ones"],
            ex_["spmm_bw_ct"], ex_["spmm_bw_orig"])
        return jnp.sum(out * jnp.asarray(gcot))

    h2 = jnp.asarray(h.reshape(-1, H * D))
    sd = jnp.einsum("nhd,hd->nh", jnp.asarray(h), jnp.asarray(a_dst))
    ss = jnp.einsum("nhd,hd->nh", jnp.asarray(h), jnp.asarray(a_src))
    dh2, dsd, dss = jax.grad(loss, argnums=(0, 1, 2))(h2, sd, ss)

    # chain rule back to h and the attention vectors
    dh = (np.asarray(dh2).reshape(-1, H, D)
          + np.asarray(dsd)[:, :, None] * a_dst[None]
          + np.asarray(dss)[:, :, None] * a_src[None])[:n]
    np.testing.assert_allclose(dh, ht.grad.numpy(), rtol=1e-3, atol=1e-4)
    da_src = np.einsum("nh,nhd->hd", np.asarray(dss)[:n], h[:n])
    da_dst = np.einsum("nh,nhd->hd", np.asarray(dsd)[:n], h[:n])
    np.testing.assert_allclose(da_src, ast.grad.numpy(), rtol=1e-3,
                               atol=1e-4)
    np.testing.assert_allclose(da_dst, adt.grad.numpy(), rtol=1e-3,
                               atol=1e-4)


def test_sage_training_parity():
    """Full-batch SAGE (reference cogdl/models/nn/graphsage.py:148 ``SAGE``)
    vs ours, trained identically on the shared SBM graph."""
    from cogdl.models.nn.graphsage import SAGE as RefSAGE

    g, row, col, x, y, masks = _shared_setup(seed=13)
    torch.manual_seed(0)
    ref_model = RefSAGE(16, 4, 32, 2, aggr="mean", dropout=0.5)
    rg = _ref_graph(row, col, g.num_nodes)
    ref = _train_reference(ref_model, rg, x, y, masks, epochs=120)

    ours = _train_ours("sage", g, epochs=120, hidden_size=32, dropout=0.5,
                       aggr="mean")
    assert ours["test"] >= ref["test"] - 0.05, (ours, ref)


def test_appnp_training_parity():
    """APPNP (reference cogdl/models/nn/ppnp.py PPNP, propagation=appnp)
    vs ours, trained identically on the shared SBM graph."""
    from cogdl.models.nn.ppnp import PPNP as RefPPNP

    g, row, col, x, y, masks = _shared_setup(seed=14)
    torch.manual_seed(0)
    ref_model = RefPPNP(16, 32, 4, num_layers=2, dropout=0.2,
                        propagation="appnp", alpha=0.1, niter=10)
    rg = _ref_graph(row, col, g.num_nodes)
    ref = _train_reference(ref_model, rg, x, y, masks, epochs=120)

    ours = _train_ours("appnp", g, epochs=120, hidden_size=32, dropout=0.2,
                       propagation_steps=10, alpha=0.1)
    assert ours["test"] >= ref["test"] - 0.05, (ours, ref)


# ---------------------------------------------------------------------------
# Round-3 breadth: GIN graph classification, RGCN typed graphs, sampled SAGE
# (wrapper/sampler logic head-to-head, not just layers)
# ---------------------------------------------------------------------------

def _multigraph_setup(k=90, seed=30):
    """Shared multi-graph set: class 0 sparse ER, class 1 dense ER —
    discriminable by sum-pooled structure statistics."""
    rng = np.random.default_rng(seed)
    graphs = []
    labels = rng.integers(0, 2, size=k)
    for lab in labels:
        n = int(rng.integers(10, 17))
        p = 0.15 if lab == 0 else 0.5
        a = rng.random((n, n)) < p
        a = np.triu(a, 1)
        r, c = np.nonzero(a | a.T)
        if r.size == 0:
            r, c = np.array([0]), np.array([1])
        x = np.ones((n, 4), np.float32)
        graphs.append((n, r, c, x))
    return graphs, labels


def test_gin_graph_classification_training_parity():
    """Reference GIN (cogdl/models/nn/gin.py:11) and ours trained on the
    same ER multi-graph set with the same split reach comparable test
    accuracy — exercising union batching + graph pooling, not just layers."""
    from cogdl.data import Batch, Graph as RefGraph
    from cogdl.models.nn.gin import GIN as RefGIN

    graphs, labels = _multigraph_setup()
    rng = np.random.default_rng(31)
    idx = rng.permutation(len(graphs))
    tr, te = idx[:60], idx[60:]

    # reference side: one Batch per split, full-batch Adam training
    def ref_batch(ids):
        gl = []
        for i in ids:
            n, r, c, x = graphs[i]
            g = RefGraph(edge_index=torch.stack(
                [torch.tensor(r, dtype=torch.long),
                 torch.tensor(c, dtype=torch.long)]))
            g.x = torch.tensor(x)
            g.y = torch.tensor([int(labels[i])])
            gl.append(g)
        return Batch.from_data_list(gl)

    torch.manual_seed(0)
    ref_model = RefGIN(num_layers=3, in_feats=4, out_feats=2, hidden_dim=32,
                       num_mlp_layers=2, dropout=0.3)
    btr, bte = ref_batch(tr), ref_batch(te)
    opt = torch.optim.Adam(ref_model.parameters(), lr=1e-2)
    ytr = torch.cat([g for g in [btr.y]]).view(-1)
    ref_model.train()
    for _ in range(80):
        opt.zero_grad()
        loss = torch.nn.functional.cross_entropy(ref_model(btr), ytr)
        loss.backward()
        opt.step()
    ref_model.eval()
    with torch.no_grad():
        pred = ref_model(bte).argmax(-1).numpy()
    ref_acc = float((pred == labels[te]).mean())

    # ours: same graphs/split through the union-batch pipeline
    import optax

    from cogdl_tpu.data.batch import make_batches

    ours_graphs = []
    for n, r, c, x in graphs:
        ours_graphs.append(from_coo(np.stack([r, c]), num_nodes=n, x=x,
                                    meta={"num_classes": 2}))
    model = build_model("gin", in_features=4, out_features=2, hidden_size=32,
                        num_layers=3, num_mlp_layers=2, dropout=0.3)
    btr_o = make_batches([ours_graphs[i] for i in tr], labels[tr],
                         batch_size=60, shuffle=False)
    bte_o = make_batches([ours_graphs[i] for i in te], labels[te],
                         batch_size=len(te), shuffle=False)
    rng_j = jax.random.PRNGKey(0)
    b0 = btr_o[0]
    variables = model.init({"params": rng_j, "dropout": rng_j}, b0, b0.x,
                           training=False)
    tx = optax.adam(1e-2)
    params, state = variables["params"], {
        k: v for k, v in variables.items() if k != "params"}
    opt_state = tx.init(params)

    @jax.jit
    def step(params, state, opt_state, b, r):
        def loss_fn(p):
            out = model.apply({"params": p, **state}, b, b.x, training=True,
                              rngs={"dropout": r},
                              mutable=list(state) or False)
            logits, upd = out if state else (out, {})
            y = b.extras["graph_y"]
            m = b.extras["graph_mask"].astype(jnp.float32)
            logp = jax.nn.log_softmax(logits, -1)
            per = -jnp.take_along_axis(logp, y[:, None], -1)[:, 0]
            return jnp.sum(per * m) / jnp.maximum(m.sum(), 1.0), upd

        (loss, upd), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        u, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, u), {**state, **upd}, opt_state

    # 200 epochs vs the reference's 80: flax BatchNorm running stats use
    # momentum 0.99 (torch: 0.1), so EVAL-mode parity needs the stats to
    # converge, not just the weights (train loss is ~1e-4 by epoch 80)
    for i in range(200):
        for b in btr_o:
            params, state, opt_state = step(params, state, opt_state, b,
                                            jax.random.fold_in(rng_j, i))
    correct = total = 0.0
    for b in bte_o:
        logits = model.apply({"params": params, **state}, b, b.x,
                             training=False)
        pred = np.asarray(jnp.argmax(logits, -1))
        m = np.asarray(b.extras["graph_mask"])
        correct += (pred[m] == np.asarray(b.extras["graph_y"])[m]).sum()
        total += m.sum()
    ours_acc = correct / total
    assert ours_acc >= ref_acc - 0.1, (ours_acc, ref_acc)


def test_rgcn_training_parity():
    """Reference RGCN (cogdl/models/nn/rgcn.py:10) vs ours on the same
    typed SBM graph — relation ids carry the class signal, so the typed
    message passing itself must work to learn."""
    from cogdl.models.nn.rgcn import RGCN as RefRGCN

    g, row, col, x, y, masks = _shared_setup(seed=15)
    R = 3
    rng = np.random.default_rng(16)
    etype = ((y[row] + y[col]) % R).astype(np.int64)

    torch.manual_seed(0)
    inner = RefRGCN(16, 4, num_layers=2, num_rels=R, num_bases=None,
                    self_loop=True, dropout=0.0)

    class RefWrap(torch.nn.Module):  # RGCN.forward wants (graph, x)
        def __init__(self):
            super().__init__()
            self.inner = inner

        def forward(self, graph):
            return self.inner(graph, graph.x)

    rg = _ref_graph(row, col, g.num_nodes)
    rg.edge_attr = torch.tensor(etype)  # reference reads types here
    ref = _train_reference(RefWrap(), rg, x, y, masks, epochs=100)

    ours_g = from_coo(np.stack([row, col]), num_nodes=g.num_nodes,
                      edge_type=etype.astype(np.int32), x=x, y=y,
                      train_mask=masks["train"], val_mask=masks["val"],
                      test_mask=masks["test"],
                      meta={"num_classes": 4, "num_relations": R})
    ours = _train_ours("rgcn", ours_g, epochs=100, hidden_size=4,
                       num_relations=R, num_bases=R, dropout=0.0)
    assert ours["test"] >= ref["test"] - 0.07, (ours, ref)


@pytest.mark.parametrize("wrapper", ["neighbor_sampling",
                                     "neighbor_sampling_device"])
def test_sampled_sage_training_parity(wrapper):
    """The SAMPLED pipelines (host C++ sampler and on-device sampler) reach
    the reference full-batch SAGE's accuracy on the shared graph — the
    sampled estimator is unbiased, so wrapper/sampler logic is what's under
    test (reference graphsage_dw + sample_adj capability)."""
    from cogdl.models.nn.graphsage import SAGE as RefSAGE

    from cogdl_tpu.experiments import train as train_ours

    g, row, col, x, y, masks = _shared_setup(seed=17)
    torch.manual_seed(0)
    ref_model = RefSAGE(16, 4, 32, 2, aggr="mean", dropout=0.3)
    rg = _ref_graph(row, col, g.num_nodes)
    ref = _train_reference(ref_model, rg, x, y, masks, epochs=100)

    from cogdl_tpu.datasets.dataset import Dataset

    res = train_ours(Dataset.from_graph(g), "sage", wrapper=wrapper, seed=0,
                     epochs=40,
                     eval_step=5, hidden_size=32, dropout=0.3,
                     fanouts=(5, 5), batch_size=64, lr=1e-2)
    assert res["test_acc"] >= ref["test"] - 0.1, (res, ref)
