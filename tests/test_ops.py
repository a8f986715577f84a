"""Operator parity tests: every segment/SpMM op vs a hand-written numpy
gather/scatter reference on random toy graphs (the reference's own test
pattern, tests/test_ops.py:1-135)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cogdl_tpu.data import from_coo
from cogdl_tpu import ops


def random_graph(rng, n=23, e=77, f=11):
    ei = rng.integers(0, n, size=(2, e))
    x = rng.normal(size=(n, f)).astype(np.float32)
    w = rng.uniform(0.1, 1.0, size=e).astype(np.float32)
    g = from_coo(ei, num_nodes=n, edge_weight=w, x=x)
    return g, x


def dense_adj(g):
    A = np.zeros((g.num_nodes, g.num_nodes), np.float32)
    row = np.asarray(g.row)[: g.num_edges]
    col = np.asarray(g.col)[: g.num_edges]
    w = np.asarray(g.edge_weight)[: g.num_edges]
    for r, c, ww in zip(row, col, w):
        A[r, c] += ww
    return A


def test_spmm_matches_dense(rng):
    g, x = random_graph(rng)
    y = np.asarray(ops.spmm(g, g.x))[: g.num_nodes]
    ref = dense_adj(g) @ x
    np.testing.assert_allclose(y, ref, rtol=1e-4, atol=1e-5)


def test_spmm_pad_rows_zero(rng):
    g, x = random_graph(rng)
    y = np.asarray(ops.spmm(g, g.x))
    # pad destination rows receive nothing except the sink row (garbage ok
    # on the sink, which is masked everywhere); all other pad rows are zero
    for i in range(g.num_nodes, g.n_pad - 1):
        np.testing.assert_allclose(y[i], 0.0, atol=1e-6)


def test_spmm_grad_matches_dense(rng):
    g, x = random_graph(rng, n=11, e=29, f=5)
    A = dense_adj(g)
    tgt = rng.normal(size=(g.num_nodes, 5)).astype(np.float32)

    def loss_sparse(xx):
        y = ops.spmm(g, xx)[: g.num_nodes]
        return jnp.sum((y - tgt) ** 2)

    def loss_dense(xx):
        return jnp.sum((jnp.asarray(A) @ xx[: g.num_nodes] - tgt) ** 2)

    with jax.default_matmul_precision("highest"):
        gs = jax.grad(loss_sparse)(g.x)
        gd = jax.grad(loss_dense)(g.x)
    np.testing.assert_allclose(np.asarray(gs)[: g.num_nodes],
                               np.asarray(gd)[: g.num_nodes], rtol=1e-3, atol=1e-4)


def test_spmm_weight_grad(rng):
    """d(loss)/d(edge_weight) — the SDDMM backward path."""
    g, x = random_graph(rng, n=9, e=17, f=4)

    def loss(w):
        y = ops.spmm_coo(g.x, g.row, g.col, w, g.n_pad)[: g.num_nodes]
        return jnp.sum(y ** 2)

    gw = np.asarray(jax.grad(loss)(g.edge_weight))
    # reference: dL/dw_e = 2 * y[row_e] . x[col_e]
    y = np.asarray(ops.spmm(g, g.x))
    xx = np.asarray(g.x)
    row = np.asarray(g.row)
    col = np.asarray(g.col)
    for e in range(g.num_edges):
        ref = 2.0 * y[row[e]] @ xx[col[e]]
        np.testing.assert_allclose(gw[e], ref, rtol=1e-3, atol=1e-4)


def test_sddmm(rng):
    g, x = random_graph(rng)
    a = rng.normal(size=(g.n_pad, 7)).astype(np.float32)
    b = rng.normal(size=(g.n_pad, 7)).astype(np.float32)
    out = np.asarray(ops.sddmm(g, jnp.asarray(a), jnp.asarray(b)))
    row, col = np.asarray(g.row), np.asarray(g.col)
    for e in range(g.num_edges):
        np.testing.assert_allclose(out[e], a[row[e]] @ b[col[e]], rtol=1e-4, atol=1e-5)


def test_edge_softmax(rng):
    g, _ = random_graph(rng)
    scores = jnp.asarray(rng.normal(size=(g.e_pad, 3)).astype(np.float32))
    att = np.asarray(ops.edge_softmax(g, scores))
    row = np.asarray(g.row)[: g.num_edges]
    # per destination, attention sums to 1 (over real edges)
    for v in set(row.tolist()):
        mask = row == v
        np.testing.assert_allclose(att[: g.num_edges][mask].sum(0), 1.0, rtol=1e-4)
    # pad edges get zero attention
    np.testing.assert_allclose(att[g.num_edges:], 0.0, atol=1e-6)


def test_edge_softmax_extreme_scores(rng):
    g, _ = random_graph(rng, n=7, e=13)
    scores = jnp.asarray(rng.normal(size=(g.e_pad,)).astype(np.float32) * 100)
    att = np.asarray(ops.edge_softmax(g, scores))
    assert np.all(np.isfinite(att))


def test_mh_spmm(rng):
    g, _ = random_graph(rng, n=13, e=31)
    H, D = 4, 6
    att = rng.uniform(size=(g.e_pad, H)).astype(np.float32)
    att[g.num_edges:] = 0.0
    h = rng.normal(size=(g.n_pad, H, D)).astype(np.float32)
    out = np.asarray(ops.mh_spmm(g, jnp.asarray(att), jnp.asarray(h)))
    ref = np.zeros((g.n_pad, H, D), np.float32)
    row, col = np.asarray(g.row), np.asarray(g.col)
    for e in range(g.num_edges):
        ref[row[e]] += att[e][:, None] * h[col[e]]
    np.testing.assert_allclose(out[: g.num_nodes], ref[: g.num_nodes], rtol=1e-4, atol=1e-5)


def test_mh_sddmm(rng):
    g, _ = random_graph(rng, n=13, e=31)
    H, D = 4, 6
    a = rng.normal(size=(g.n_pad, H, D)).astype(np.float32)
    b = rng.normal(size=(g.n_pad, H, D)).astype(np.float32)
    out = np.asarray(ops.mh_sddmm(g, jnp.asarray(a), jnp.asarray(b)))
    row, col = np.asarray(g.row), np.asarray(g.col)
    for e in range(g.num_edges):
        for hh in range(H):
            np.testing.assert_allclose(out[e, hh], a[row[e], hh] @ b[col[e], hh],
                                       rtol=1e-4, atol=1e-5)


def test_generic_message_ops(rng):
    g, x = random_graph(rng, n=11, e=37, f=5)
    ef = rng.normal(size=(g.e_pad,)).astype(np.float32)
    row, col = np.asarray(g.row), np.asarray(g.col)
    for name, comb in [("s_add_e_sum", np.add), ("s_mul_e_sum", np.multiply),
                       ("s_sub_e_sum", np.subtract)]:
        out = np.asarray(getattr(ops, name)(g, g.x, jnp.asarray(ef)))
        ref = np.zeros((g.n_pad, 5), np.float32)
        for e in range(g.num_edges):
            ref[row[e]] += comb(np.asarray(g.x)[col[e]], ef[e])
        np.testing.assert_allclose(out[: g.num_nodes], ref[: g.num_nodes],
                                   rtol=1e-4, atol=1e-4)


def test_aggregate_mean_max(rng):
    g, x = random_graph(rng, n=11, e=37, f=5)
    row, col = np.asarray(g.row), np.asarray(g.col)
    xx = np.asarray(g.x)
    mean_out = np.asarray(ops.aggregate(g, g.x, "mean"))
    max_out = np.asarray(ops.aggregate(g, g.x, "max"))
    for v in range(g.num_nodes):
        nbrs = col[: g.num_edges][row[: g.num_edges] == v]
        if len(nbrs):
            np.testing.assert_allclose(mean_out[v], xx[nbrs].mean(0), rtol=1e-4, atol=1e-5)
            np.testing.assert_allclose(max_out[v], xx[nbrs].max(0), rtol=1e-4, atol=1e-5)
        else:
            np.testing.assert_allclose(mean_out[v], 0.0, atol=1e-6)


def test_scatter_max_with_argmax(rng):
    g, _ = random_graph(rng, n=9, e=25)
    data = jnp.asarray(rng.normal(size=(g.e_pad,)).astype(np.float32))
    m, amax = ops.scatter_max_with_argmax(
        jnp.where(g.edge_mask(), data, -1e30), g.row, g.n_pad
    )
    m, amax = np.asarray(m), np.asarray(amax)
    row = np.asarray(g.row)[: g.num_edges]
    d = np.asarray(data)[: g.num_edges]
    for v in range(g.num_nodes):
        idx = np.where(row == v)[0]
        if len(idx):
            assert abs(m[v] - d[idx].max()) < 1e-5
            assert amax[v] in idx and abs(d[amax[v]] - d[idx].max()) < 1e-5


def test_segment_mean_empty_segments(rng):
    data = jnp.ones((4, 3))
    ids = jnp.array([0, 0, 2, 2])
    out = np.asarray(ops.segment_mean(data, ids, 4))
    np.testing.assert_allclose(out[0], 1.0)
    np.testing.assert_allclose(out[1], 0.0)
    np.testing.assert_allclose(out[3], 0.0)


def test_ops_jit_and_vmap(rng):
    g, _ = random_graph(rng)
    f = jax.jit(lambda gg, xx: ops.spmm(gg, xx))
    y1 = f(g, g.x)
    y2 = ops.spmm(g, g.x)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), rtol=1e-5)
    # vmap over a batch of feature matrices
    xs = jnp.stack([g.x, g.x * 2])
    ys = jax.vmap(lambda xx: ops.spmm(g, xx))(xs)
    np.testing.assert_allclose(np.asarray(ys[1]), 2 * np.asarray(ys[0]), rtol=1e-5)
