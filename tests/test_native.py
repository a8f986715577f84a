"""Native C++ sampler library: build, correctness vs numpy, throughput sanity."""

import numpy as np
import pytest

from cogdl_tpu import native
from cogdl_tpu.data.sampling import graph_csr
from cogdl_tpu.datasets.synthetic import sbm_graph

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native lib unavailable")


@pytest.fixture(scope="module")
def csr():
    g = sbm_graph(num_nodes=400, seed=2)
    indptr, indices, _ = graph_csr(g)
    # native binary-search path in node2vec requires sorted neighbor lists
    for v in range(g.num_nodes):
        indices[indptr[v]: indptr[v + 1]].sort()
    return g, indptr, indices


def test_sample_neighbors_valid(csr):
    g, indptr, indices = csr
    seeds = np.arange(100, dtype=np.int64)
    src, mask = native.sample_neighbors(indptr, indices, seeds, fanout=7, seed=3)
    assert src.shape == (700,)
    src2 = src.reshape(100, 7)
    m2 = mask.reshape(100, 7)
    for i in range(100):
        nbrs = set(indices[indptr[i]: indptr[i + 1]].tolist())
        for k in range(7):
            if m2[i, k]:
                assert src2[i, k] in nbrs


def test_sample_deterministic(csr):
    g, indptr, indices = csr
    seeds = np.arange(50, dtype=np.int64)
    a, _ = native.sample_neighbors(indptr, indices, seeds, 5, seed=11)
    b, _ = native.sample_neighbors(indptr, indices, seeds, 5, seed=11)
    np.testing.assert_array_equal(a, b)


def test_random_walk_edges_exist(csr):
    g, indptr, indices = csr
    starts = np.arange(60, dtype=np.int64)
    walks = native.random_walk(indptr, indices, starts, walk_length=8, seed=5)
    assert walks.shape == (60, 8)
    np.testing.assert_array_equal(walks[:, 0], starts)
    for w in walks[:20]:
        for a, b in zip(w[:-1], w[1:]):
            nbrs = indices[indptr[a]: indptr[a + 1]]
            assert b in nbrs or b == a  # stuck on isolated nodes allowed


def test_random_walk_restart(csr):
    g, indptr, indices = csr
    starts = np.arange(50, dtype=np.int64)
    walks = native.random_walk(indptr, indices, starts, walk_length=40,
                               restart_prob=0.5, seed=5)
    # with restarts, the start node shows up often
    frac_at_start = np.mean(walks == starts[:, None])
    assert frac_at_start > 0.2


def test_node2vec_walks(csr):
    g, indptr, indices = csr
    starts = np.arange(30, dtype=np.int64)
    walks = native.node2vec_walk(indptr, indices, starts, walk_length=6,
                                 p=0.5, q=2.0, seed=5)
    assert walks.shape == (30, 6)
    for w in walks[:10]:
        for a, b in zip(w[:-1], w[1:]):
            nbrs = indices[indptr[a]: indptr[a + 1]]
            assert b in nbrs or b == a


def test_induced_subgraph_matches_numpy(csr):
    g, indptr, indices = csr
    nodes = np.arange(0, 200, 2, dtype=np.int64)
    row, col = native.induced_subgraph(indptr, indices, nodes, g.num_nodes)
    # numpy reference
    sel = np.zeros(g.num_nodes, bool)
    sel[nodes] = True
    E = g.num_edges
    rr = np.asarray(g.row)[:E]
    cc = np.asarray(g.col)[:E]
    keep = sel[rr] & sel[cc]
    assert row.shape[0] == int(keep.sum())
    relabel = np.full(g.num_nodes, -1)
    relabel[nodes] = np.arange(nodes.shape[0])
    got = set(zip(row.tolist(), col.tolist()))
    want = set(zip(relabel[rr[keep]].tolist(), relabel[cc[keep]].tolist()))
    assert got == want


def test_coo2csr_roundtrip(csr):
    g, _, _ = csr
    E = g.num_edges
    rr = np.asarray(g.row)[:E].astype(np.int64)
    cc = np.asarray(g.col)[:E].astype(np.int64)
    indptr, indices, perm = native.coo2csr(rr, cc, g.num_nodes)
    assert indptr[-1] == E
    for v in range(0, g.num_nodes, 37):
        got = sorted(indices[indptr[v]: indptr[v + 1]].tolist())
        want = sorted(cc[rr == v].tolist())
        assert got == want
