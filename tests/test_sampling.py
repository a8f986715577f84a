"""Samplers: neighbor fan-out blocks, BFS cluster partition, SAINT subgraphs —
all must produce statically shaped, correctly connected batches."""

import numpy as np
import pytest

from cogdl_tpu.data.sampling import (
    ClusterLoader,
    NeighborSampler,
    bfs_partition,
    graph_csr,
    random_partition_batches,
    saint_node_subgraph,
    saint_walk_subgraph,
    sample_adj,
)
from cogdl_tpu.datasets.synthetic import sbm_graph


@pytest.fixture(scope="module")
def g():
    return sbm_graph(num_nodes=300, seed=1)


def test_graph_csr_roundtrip(g):
    indptr, indices, w = graph_csr(g)
    assert indptr[-1] == g.num_edges
    assert indices.max() < g.num_nodes


def test_sample_adj_shapes_and_validity(g):
    indptr, indices, _ = graph_csr(g)
    rng = np.random.default_rng(0)
    seeds = np.arange(50)
    src, dst_local, mask = sample_adj(indptr, indices, seeds, 5, rng)
    assert src.shape == (250,) and mask.shape == (250,)
    # sampled sources must actually be neighbors of their seed
    for s, d, m in zip(src[:100], dst_local[:100], mask[:100]):
        if m:
            nbrs = indices[indptr[seeds[d]]: indptr[seeds[d] + 1]]
            assert s in nbrs


def test_neighbor_sampler_static_shapes(g):
    ns = NeighborSampler(g, fanouts=[5, 5], batch_size=32, seed=0)
    shapes = set()
    for blocks, frame, seeds in ns.epoch():
        assert len(blocks) == 2
        shapes.add(tuple((b.n_pad, b.e_pad) for b in blocks))
        assert seeds.shape == (32,)
        # dst nodes (seeds) are the first rows of the frame
        assert set(seeds.tolist()) <= set(frame[: len(seeds) * 2].tolist())
    assert len(shapes) == 1  # every batch identical static shape


def test_neighbor_sampler_edges_exist(g):
    ns = NeighborSampler(g, fanouts=[4], batch_size=16, seed=0)
    E = g.num_edges
    real = set(zip(np.asarray(g.row)[:E].tolist(),
                   np.asarray(g.col)[:E].tolist()))
    blocks, frame, seeds = next(ns.epoch())
    b = blocks[0]
    row = np.asarray(b.row)[: b.num_edges]
    col = np.asarray(b.col)[: b.num_edges]
    for r, c in list(zip(row, col))[:50]:
        assert (frame[r], frame[c]) in real


def test_bfs_partition_balanced(g):
    part = bfs_partition(g, 4, seed=0)
    sizes = np.bincount(part, minlength=4)
    assert part.shape[0] == g.num_nodes
    assert sizes.max() <= (g.num_nodes // 4) + 2


def test_cluster_loader(g):
    cl = ClusterLoader(g, n_clusters=6, batch_size=2, seed=0)
    batches = list(cl.epoch())
    assert len(batches) == 3
    tot_nodes = sum(b.num_nodes for b in batches)
    assert tot_nodes == g.num_nodes
    for b in batches:
        assert b.n_pad == batches[0].n_pad  # shared static shape
        assert b.x is not None and b.x.shape[0] == b.n_pad


def test_saint_samplers(g):
    rng = np.random.default_rng(0)
    nodes = saint_node_subgraph(g, 50, rng)
    assert len(np.unique(nodes)) == 50
    walk_nodes = saint_walk_subgraph(g, roots=10, length=4, rng=rng)
    assert walk_nodes.shape[0] >= 10


def test_random_partition(g):
    batches = list(random_partition_batches(g, 5, seed=0))
    assert len(batches) == 5
    assert sum(b.num_nodes for b in batches) == g.num_nodes


def test_prefetcher_order_restart_and_errors():
    from cogdl_tpu.data.sampling import Prefetcher

    pf = Prefetcher(lambda: iter(range(7)), to_device=False)
    assert list(pf) == list(range(7))
    assert list(pf) == list(range(7))  # restartable (one thread per epoch)

    def bad():
        yield 1
        raise ValueError("boom")

    pf = Prefetcher(bad, to_device=False)
    with pytest.raises(ValueError, match="boom"):
        list(pf)


def test_prefetcher_device_put(g):
    import jax
    from cogdl_tpu.data.sampling import Prefetcher

    pf = Prefetcher(lambda: iter([np.arange(4, dtype=np.int32)]))
    (a,) = list(pf)
    assert isinstance(a, jax.Array)
    np.testing.assert_array_equal(np.asarray(a), np.arange(4))


def test_neighbor_sampler_device_features_match(g):
    """device_features=True ships only the frame index; gathering from the
    resident table reproduces the host-gathered block features exactly."""
    import jax.numpy as jnp

    host = NeighborSampler(g, fanouts=[5, 5], batch_size=32, seed=7)
    dev = NeighborSampler(g, fanouts=[5, 5], batch_size=32, seed=7,
                          device_features=True)
    (hb, hf, hs), (db, df, ds) = (next(host.epoch(shuffle=False)),
                                  next(dev.epoch(shuffle=False)))
    np.testing.assert_array_equal(hf, df)
    assert db[0].x is None and "frame" in db[0].extras
    got = jnp.take(g.x, db[0].extras["frame"], axis=0, mode="clip")
    np.testing.assert_allclose(np.asarray(got), np.asarray(hb[0].x),
                               rtol=0, atol=0)
    # y / train_mask still ride the blocks in both modes
    np.testing.assert_array_equal(np.asarray(db[0].y), np.asarray(hb[0].y))
