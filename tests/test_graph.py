"""Graph container: construction, padding contract, normalisation, transforms."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cogdl_tpu.data import (
    Graph,
    add_self_loops,
    from_coo,
    remove_self_loops,
    reverse,
    row_norm,
    sym_norm,
    to_undirected,
    pad_to,
)


def toy_graph(**kw):
    # 4 nodes, edges (dst, src): 0<-1, 0<-2, 1<-2, 2<-3, 3<-3 (self loop)
    ei = np.array([[0, 0, 1, 2, 3], [1, 2, 2, 3, 3]])
    x = np.eye(4, dtype=np.float32)
    return from_coo(ei, num_nodes=4, x=x, **kw)


def test_construction_and_padding():
    g = toy_graph()
    assert g.num_nodes == 4 and g.num_edges == 5
    assert g.n_pad >= 5 and g.e_pad >= 5
    assert g.row_ptr.shape == (g.n_pad + 1,)
    # pad edges point at the sink with zero weight
    sink = g.n_pad - 1
    np.testing.assert_array_equal(np.asarray(g.row)[g.num_edges:], sink)
    np.testing.assert_array_equal(np.asarray(g.col)[g.num_edges:], sink)
    np.testing.assert_array_equal(np.asarray(g.edge_weight)[g.num_edges:], 0.0)
    # CSR pointer consistent with sorted row vector
    row = np.asarray(g.row)
    ptr = np.asarray(g.row_ptr)
    for v in range(g.n_pad):
        assert ptr[v + 1] - ptr[v] == np.sum(row == v)
    # masks
    assert np.asarray(g.node_mask()).sum() == 4
    assert np.asarray(g.edge_mask()).sum() == 5


def test_graph_is_pytree():
    g = toy_graph()
    leaves = jax.tree_util.tree_leaves(g)
    assert any(leaf.shape == g.col.shape for leaf in leaves)

    @jax.jit
    def f(graph):
        return graph.edge_weight.sum()

    assert float(f(g)) == 5.0


def test_degrees():
    g = toy_graph()
    deg_in = np.asarray(g.in_degrees())
    np.testing.assert_array_equal(deg_in[:4], [2, 1, 1, 1])
    deg_out = np.asarray(g.out_degrees())
    np.testing.assert_array_equal(deg_out[:4], [0, 1, 2, 2])


def test_sym_norm_matches_dense():
    g = add_self_loops(to_undirected(toy_graph()))
    gn = sym_norm(g)
    N = g.num_nodes
    A = np.zeros((N, N), np.float32)
    row, col, w = np.asarray(g.row), np.asarray(g.col), np.asarray(g.edge_weight)
    for r, c, ww in zip(row[: g.num_edges], col[: g.num_edges], w[: g.num_edges]):
        A[r, c] += ww
    d = A.sum(1)
    Dn = np.diag(1.0 / np.sqrt(d))
    ref = Dn @ A @ Dn
    An = np.zeros((N, N), np.float32)
    wn = np.asarray(gn.edge_weight)
    for r, c, ww in zip(row[: g.num_edges], col[: g.num_edges], wn[: g.num_edges]):
        An[r, c] += ww
    np.testing.assert_allclose(An, ref, rtol=1e-5)


def test_row_norm_rows_sum_to_one():
    g = add_self_loops(toy_graph())
    gn = row_norm(g)
    sums = np.asarray(gn.in_degrees(weighted=True))[: g.num_nodes]
    np.testing.assert_allclose(sums, 1.0, rtol=1e-5)


def test_self_loop_roundtrip():
    g = toy_graph()
    g2 = add_self_loops(g)
    assert g2.num_edges == 4 + 4  # 4 non-loop edges kept + 4 loops
    g3 = remove_self_loops(g2)
    assert g3.num_edges == 4


def test_to_undirected_symmetric():
    g = to_undirected(toy_graph())
    row = np.asarray(g.row)[: g.num_edges]
    col = np.asarray(g.col)[: g.num_edges]
    s = set(zip(row.tolist(), col.tolist()))
    assert all((c, r) in s for r, c in s)


def test_reverse_transposes():
    g = toy_graph()
    gr = reverse(g)
    a = set(zip(np.asarray(g.row)[:5].tolist(), np.asarray(g.col)[:5].tolist()))
    b = set(zip(np.asarray(gr.col)[: gr.num_edges].tolist(),
                np.asarray(gr.row)[: gr.num_edges].tolist()))
    assert a == b


def test_pad_to_grows_static_shapes():
    g = toy_graph()
    g2 = pad_to(g, n_pad=16, e_pad=32)
    assert g2.n_pad == 16 and g2.e_pad == 32
    assert g2.num_nodes == 4 and g2.num_edges == 5
    assert g2.x.shape == (16, 4)
    np.testing.assert_array_equal(np.asarray(g2.x)[4:], 0.0)


def test_meta_is_static():
    g = toy_graph(meta={"num_classes": 7, "name": "toy"})
    assert g.num_classes == 7
    assert g.meta_get("name") == "toy"
    traces = []

    @jax.jit
    def f(graph):
        traces.append(1)
        return graph.edge_weight.sum()

    f(g)
    f(g.with_meta(num_classes=7))
    assert len(traces) == 1  # same static meta → no retrace


def test_to_scipy_and_networkx_export():
    from cogdl_tpu.data.graph import from_coo, to_networkx, to_scipy

    ei = np.array([[1, 2, 3], [0, 1, 2]])
    g = from_coo(ei, num_nodes=4, edge_weight=np.array([1., 2., 3.]))
    A = to_scipy(g)
    assert A.shape == (4, 4) and A[1, 0] == 1.0 and A[3, 2] == 3.0
    G = to_networkx(g)
    assert G.number_of_nodes() == 4
    assert G.has_edge(0, 1)  # col (source) -> row (destination)


def test_subgraph_relabels_and_keeps_data():
    from cogdl_tpu.data.graph import from_coo, subgraph

    rng = np.random.default_rng(0)
    N = 20
    ei = rng.integers(0, N, (2, 80))
    y = rng.integers(0, 3, N)
    g = from_coo(ei, num_nodes=N, x=rng.normal(size=(N, 4)).astype(np.float32),
                 y=y)
    nodes = np.array([3, 7, 11, 15])
    sg = subgraph(g, nodes)
    assert sg.num_nodes == 4
    assert np.array_equal(np.asarray(sg.y)[:4], y[nodes])
    # all surviving edges connect selected nodes
    E = sg.num_edges
    assert (np.asarray(sg.row)[:E] < 4).all()


def test_edge_subgraph():
    from cogdl_tpu.data.graph import edge_subgraph, from_coo

    ei = np.array([[1, 2, 3, 0], [0, 1, 2, 3]])
    g = from_coo(ei, num_nodes=4)
    sg = edge_subgraph(g, [0, 1], relabel=True)
    assert sg.num_edges == 2 and sg.num_nodes == 3
    sg2 = edge_subgraph(g, [0, 1], relabel=False)
    assert sg2.num_nodes == 4


def test_local_graph_scoped_override():
    import jax.numpy as jnp

    from cogdl_tpu.data.graph import from_coo, local_graph

    g = from_coo(np.array([[1], [0]]), num_nodes=2,
                 edge_weight=np.array([1.0]))
    with local_graph(g, edge_weight=g.edge_weight * 5) as g2:
        assert float(g2.edge_weight[0]) == 5.0
    assert float(g.edge_weight[0]) == 1.0
