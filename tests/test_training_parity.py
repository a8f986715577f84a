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
