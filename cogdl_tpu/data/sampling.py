"""Host-side graph samplers emitting statically shaped device batches.

Rebuild of the reference sampler stack — NeighborSamplerDataset
(cogdl/data/sampler.py:62-117), ClusteredDataset/METIS (:188-245),
RandomPartition (:272-294), C++ sample_adj (cogdl/operators/sample/sample.cpp)
and the GraphSAINT samplers — as vectorised numpy with **fixed-shape padded
outputs** so every minibatch reuses one compiled program (SURVEY.md §7
"Sampling" design point; METIS is replaced by BFS-grown balanced partitions).
"""

from __future__ import annotations

from typing import Iterator, List, Optional, Sequence, Tuple

import numpy as np

from .graph import Graph, from_coo, _bucket


def graph_csr(graph: Graph) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(indptr, indices, weights) of real edges, destination-major."""
    E = graph.num_edges
    row = np.asarray(graph.row)[:E]
    col = np.asarray(graph.col)[:E]
    w = np.asarray(graph.edge_weight)[:E]
    order = np.argsort(row, kind="stable")
    row, col, w = row[order], col[order], w[order]
    indptr = np.zeros(graph.num_nodes + 1, np.int64)
    np.cumsum(np.bincount(row, minlength=graph.num_nodes), out=indptr[1:])
    return indptr, col, w


def sample_adj(
    indptr: np.ndarray,
    indices: np.ndarray,
    seeds: np.ndarray,
    fanout: int,
    rng: np.random.Generator,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """One-hop fan-out sampling (reference sample.cpp:7-50 semantics):
    returns (src_global, dst_local, mask) arrays of fixed shape
    [len(seeds) * fanout]. Uses the native C++/OpenMP sampler when built
    (cogdl_tpu.native), numpy otherwise."""
    from .. import native

    n = seeds.shape[0]
    if native.available():
        src, mask = native.sample_neighbors(
            indptr, indices, seeds, fanout,
            seed=int(rng.integers(0, 2 ** 62)))
        dst_local = np.repeat(np.arange(n), fanout)
        return src, dst_local, mask
    deg = indptr[seeds + 1] - indptr[seeds]
    # random offsets per slot; slots beyond degree are masked
    offs = (rng.random((n, fanout)) * np.maximum(deg, 1)[:, None]).astype(np.int64)
    take = np.minimum(offs, np.maximum(deg - 1, 0)[:, None])
    # clip: a zero-degree seed's CSR offset may equal len(indices)
    pos = np.minimum(indptr[seeds][:, None] + take,
                     max(indices.shape[0] - 1, 0))
    src = indices[pos] if indices.size else np.zeros((n, fanout), np.int64)
    mask = np.broadcast_to(deg[:, None], (n, fanout)) > 0
    # masked slots point at the seed itself (native sampler semantics) so
    # downstream relabeling never sees an id outside the sampled frame
    src = np.where(mask, src, seeds[:, None])
    # dedupe within a row cheaply: allow repeats (uniform with replacement),
    # matching the reference's replace=True default
    dst_local = np.broadcast_to(np.arange(n)[:, None], (n, fanout))
    return src.ravel(), dst_local.ravel(), mask.ravel()


class NeighborSampler:
    """Multi-hop fan-out sampler → per-hop bipartite block Graphs.

    Each batch yields ``(blocks, input_ids, seed_ids)``. Blocks are ordered
    OUTERMOST-FIRST to match the model contract (GraphSAGE consumes
    ``blocks[i]`` at layer ``i``, and layer 0 must cover the LARGEST frontier
    so later layers aggregate properly mixed representations): ``blocks[0]``
    holds the edges sampled at the last expansion hop (dst = the full
    frontier), ``blocks[-1]`` the seed-destination edges. ``blocks[0].x``
    rows are gathered input features over the shared node frame. All batches
    share identical shapes.
    """

    def __init__(self, graph: Graph, fanouts: Sequence[int],
                 batch_size: int = 512, seed: int = 0,
                 node_idx: Optional[np.ndarray] = None,
                 device_features: bool = False):
        self.graph = graph
        self.fanouts = list(fanouts)
        self.batch_size = batch_size
        # device_features: keep the feature table resident on device and
        # ship only the (padded) frame INDEX array per batch — a sampled
        # batch then costs ~1 MB of transfer instead of the gathered feature
        # rows (134 MB at 1M nodes / F=128). Consumers gather on device:
        # x = take(graph.x, blocks[0].extras["frame"], mode="clip"); the
        # frame pads point at the graph's zero sink row.
        self.device_features = device_features
        self.rng = np.random.default_rng(seed)
        self.indptr, self.indices, _ = graph_csr(graph)
        if node_idx is None:
            node_idx = np.nonzero(np.asarray(graph.train_mask)
                                  [: graph.num_nodes])[0]
        self.node_idx = node_idx
        # static sizes per hop
        self.n_layers = len(self.fanouts)
        sizes = [batch_size]
        for f in self.fanouts:
            sizes.append(sizes[-1] * f + sizes[-1])
        self.layer_sizes = sizes  # nodes at each depth (upper bound)

    def __len__(self):
        return (len(self.node_idx) + self.batch_size - 1) // self.batch_size

    def epoch(self, shuffle: bool = True) -> Iterator[Tuple[List[Graph], np.ndarray, np.ndarray]]:
        idx = self.node_idx.copy()
        if shuffle:
            self.rng.shuffle(idx)
        B = self.batch_size
        x_full = (None if (self.graph.x is None or self.device_features)
                  else np.asarray(self.graph.x))
        y_full = None if self.graph.y is None else np.asarray(self.graph.y)
        for start in range(0, len(idx), B):
            seeds = idx[start: start + B]
            if seeds.shape[0] < B:  # static batch: tile-pad with repeats
                # (np.resize tiles cyclically — works when B > len(idx))
                seeds = np.concatenate(
                    [seeds, np.resize(idx, B - seeds.shape[0])])
            blocks = []
            cur = seeds  # global ids at current depth (dst side)
            all_nodes = seeds
            per_hop_edges = []
            for f in self.fanouts:
                src, dst_local, mask = sample_adj(
                    self.indptr, self.indices, cur, f, self.rng)
                per_hop_edges.append((src, dst_local, mask, cur))
                cur = np.concatenate([cur, src[mask]])  # keep order: dst first
                cur = cur[np.sort(np.unique(cur, return_index=True)[1])]
                all_nodes = cur
            # build blocks: block k aggregates hop-(k+1) sources into hop-k
            # dst, all relabelled into one shared node frame (dst-first order)
            frame = all_nodes
            n_pad = _bucket(self.layer_sizes[-1] + 1)
            e_pads = [_bucket(self.layer_sizes[k] * self.fanouts[k])
                      for k in range(self.n_layers)]
            order = np.argsort(frame)
            sorted_frame = frame[order]

            def relabel(globals_):
                pos = np.searchsorted(sorted_frame, globals_)
                return order[pos]

            for k, (src, dst_local, mask, dst_global) in enumerate(per_hop_edges):
                rows = relabel(dst_global)[dst_local]
                cols = relabel(src)
                rows, cols = rows[mask], cols[mask]
                blk = from_coo(np.stack([rows, cols]),
                               num_nodes=frame.shape[0],
                               n_pad=n_pad, e_pad=e_pads[k])
                blocks.append(blk)
            blocks.reverse()  # outermost-first: layer i consumes blocks[i]
            feats = None
            if x_full is not None:
                feats = np.zeros((n_pad, x_full.shape[1]), x_full.dtype)
                feats[: frame.shape[0]] = x_full[frame]
            ys = None
            if y_full is not None:
                ys = np.zeros(n_pad, y_full.dtype)
                ys[: frame.shape[0]] = y_full[frame]
            # carry the train mask per frame node: wrap-padded seed batches
            # dedup, so "first batch_size rows" may include sampled NEIGHBORS
            # — a position mask alone would train on val/test labels
            tm = np.zeros(n_pad, bool)
            if self.graph.train_mask is not None:
                tm[: frame.shape[0]] = np.asarray(
                    self.graph.train_mask)[frame]
            import jax.numpy as jnp

            blocks = [b.replace(x=None if feats is None else jnp.asarray(feats),
                                y=None if ys is None else jnp.asarray(ys),
                                train_mask=jnp.asarray(tm))
                      for b in blocks]
            if self.device_features:
                fr = np.full(n_pad, self.graph.n_pad - 1, np.int32)
                fr[: frame.shape[0]] = frame
                # the table rides the batch PYTREE (device_put of an
                # already-committed array is a no-op) so the jitted step
                # sees it as an ARGUMENT — closing over it would embed a
                # multi-hundred-MB constant in the compiled program (the
                # remote-compile relay rejects those outright)
                blocks[0] = blocks[0].replace(
                    extras={"frame": jnp.asarray(fr),
                            "x_table": self.graph.x})
            yield blocks, frame, seeds


class Prefetcher:
    """Background-thread batch pipeline: overlap host-side sampling (and the
    host→device transfer) with the device train step — the TPU-feed analog
    of the reference's ``DataLoader(num_workers=4)`` sampling workers
    (cogdl/wrappers/data_wrapper/node_classification/graphsage_dw.py).

    Wraps a zero-arg iterator factory; each ``iter()`` starts a fresh worker
    thread that runs the sampler and ``jax.device_put``s each batch into a
    bounded queue, so transfer rides ahead of compute. Restartable (one
    thread per epoch); worker exceptions re-raise in the consumer. If the
    consumer abandons iteration early, the daemon worker parks on the full
    queue until process exit (epochs are normally drained fully).
    """

    _SENTINEL = object()

    def __init__(self, factory, depth: int = 2, to_device: bool = True):
        self.factory = factory
        self.depth = depth
        self.to_device = to_device

    def __iter__(self):
        import queue
        import threading

        import jax

        q: "queue.Queue" = queue.Queue(maxsize=self.depth)

        def worker():
            try:
                for item in self.factory():
                    if self.to_device:
                        item = jax.device_put(item)
                    q.put(item)
                q.put(self._SENTINEL)
            except BaseException as e:  # propagate into the consumer
                q.put(e)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is self._SENTINEL:
                break
            if isinstance(item, BaseException):
                raise item
            yield item
        t.join()


def bfs_partition(graph: Graph, n_parts: int, seed: int = 0,
                  weights=None, node_slack: float = 1.5) -> np.ndarray:
    """Balanced BFS-grown partition — the METIS replacement
    (reference ClusteredDataset uses `import metis`, sampler.py:194).
    Greedy multi-source BFS with per-part budget caps.

    ``weights=None`` balances node counts (the original behaviour).
    ``weights="degree"`` balances per-part IN-degree sums instead — the
    right objective for distributed dst-partitioned SpMM, where the padded
    per-shard edge count ``El = max_p edges(p)`` sets every shard's cost; a
    secondary node-count cap (``node_slack`` × the balanced share) bounds
    the per-shard node padding ``Nl``. An explicit per-node weight array is
    also accepted."""
    N = graph.num_nodes
    indptr, indices, _ = graph_csr(graph)
    rng = np.random.default_rng(seed)
    if weights is None:
        wt = np.ones(N, np.int64)
        node_cap = None
    else:
        if isinstance(weights, str):
            if weights != "degree":
                raise ValueError(f"unknown weights {weights!r}")
            wt = (indptr[1:] - indptr[:-1]).astype(np.int64) + 1
        else:
            wt = np.asarray(weights, np.int64)
        node_cap = int(np.ceil(N / n_parts * node_slack))
    cap = int(np.ceil(wt.sum() / n_parts))
    part = np.full(N, -1, np.int64)
    sizes = np.zeros(n_parts, np.int64)      # weight budget used
    counts = np.zeros(n_parts, np.int64)     # node counts

    def fits(p):
        return sizes[p] < cap and (node_cap is None or counts[p] < node_cap)

    seeds = rng.choice(N, size=n_parts, replace=False if N >= n_parts else True)
    frontiers = [[s] for s in seeds]
    for p, s in enumerate(seeds):
        if part[s] == -1:
            part[s] = p
            sizes[p] += wt[s]
            counts[p] += 1
    active = True
    while active:
        active = False
        for p in range(n_parts):
            if not fits(p) or not frontiers[p]:
                continue
            nxt = []
            for u in frontiers[p]:
                for v in indices[indptr[u]: indptr[u + 1]]:
                    if part[v] == -1 and fits(p):
                        part[v] = p
                        sizes[p] += wt[v]
                        counts[p] += 1
                        nxt.append(v)
            frontiers[p] = nxt
            if nxt:
                active = True
    # unassigned (disconnected / capped out) → lightest part under node cap
    for v in np.nonzero(part == -1)[0]:
        order = np.argsort(sizes)
        p = next((int(q) for q in order
                  if node_cap is None or counts[q] < node_cap), int(order[0]))
        part[v] = p
        sizes[p] += wt[v]
        counts[p] += 1
    return part


_DIGEST_CACHE: dict = {}


def _structure_digest(row, col, E: int) -> str:
    """Edge-structure fingerprint, memoized per (row, col) ARRAY IDENTITY —
    for device-resident graphs the hash pulls both edge arrays over the TPU
    tunnel, so repeated partition lookups on the same Graph must not re-pay
    it. Weakrefs guard id() reuse after GC; same arrays → same digest."""
    import hashlib
    import weakref

    key = (id(row), id(col), E)
    hit = _DIGEST_CACHE.get(key)
    if hit is not None:
        ref_r, ref_c, digest = hit
        if ref_r() is row and ref_c() is col:
            return digest
    h = hashlib.blake2b(digest_size=8)
    h.update(np.ascontiguousarray(np.asarray(row)[:E]))
    h.update(np.ascontiguousarray(np.asarray(col)[:E]))
    digest = h.hexdigest()
    try:
        _DIGEST_CACHE[key] = (weakref.ref(row), weakref.ref(col), digest)
        if len(_DIGEST_CACHE) > 64:
            _DIGEST_CACHE.pop(next(iter(_DIGEST_CACHE)))
    except TypeError:  # non-weakref-able array type: skip memoization
        pass
    return digest


def bfs_partition_cached(graph: Graph, n_parts: int, seed: int = 0,
                         weights=None, cache_dir=None) -> np.ndarray:
    """:func:`bfs_partition` with an on-disk cache — the analog of the
    reference's ``ClusteredDataset.preprocess`` partition cache
    (sampler.py:220-245), keyed by graph identity + partition parameters so
    OGB-scale graphs pay the BFS once per configuration."""
    if cache_dir is None:
        return bfs_partition(graph, n_parts, seed, weights=weights)
    import os

    import hashlib

    name = graph.meta_get("name", "graph")
    # name/N/E alone don't identify a graph (a reorder() or a different
    # generator seed preserves all three) — fingerprint the edge structure,
    # and the weight VALUES when a custom array is passed
    E = graph.num_edges
    gdigest = _structure_digest(graph.row, graph.col, E)
    if isinstance(weights, (str, type(None))):
        wtag = weights
    else:
        wh = hashlib.blake2b(
            np.ascontiguousarray(np.asarray(weights)), digest_size=6)
        wtag = f"custom{wh.hexdigest()}"
    key = (f"{name}_N{graph.num_nodes}_E{E}_g{gdigest}"
           f"_p{n_parts}_s{seed}_w{wtag}.npy")
    path = os.path.join(cache_dir, key)
    if os.path.exists(path):
        part = np.load(path)
        if part.shape[0] == graph.num_nodes:
            return part
    part = bfs_partition(graph, n_parts, seed, weights=weights)
    os.makedirs(cache_dir, exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        np.save(f, part)
    os.replace(tmp, path)
    return part


class ClusterLoader:
    """ClusterGCN-style loader: per-epoch random groups of partitions →
    induced-subgraph batches with one shared static shape
    (reference ClusteredLoader, sampler.py:246). ``cache_dir`` persists the
    partition like the reference's preprocess cache."""

    def __init__(self, graph: Graph, n_clusters: int = 20,
                 batch_size: int = 5, seed: int = 0, cache_dir=None):
        self.graph = graph
        self.n_clusters = n_clusters
        self.batch_size = batch_size
        self.rng = np.random.default_rng(seed)
        self.part = bfs_partition_cached(graph, n_clusters, seed,
                                         cache_dir=cache_dir)
        E = graph.num_edges
        self._row = np.asarray(graph.row)[:E]
        self._col = np.asarray(graph.col)[:E]
        self._w = np.asarray(graph.edge_weight)[:E]
        # static shapes: worst-case nodes/edges over random groups ≈ uniform
        counts = np.bincount(self.part, minlength=n_clusters)
        self.n_pad = _bucket(int(np.sort(counts)[-batch_size:].sum()) + 1)
        self.e_pad = None  # computed lazily after first epoch scan

    def epoch(self) -> Iterator[Graph]:
        order = self.rng.permutation(self.n_clusters)
        groups = [order[i: i + self.batch_size]
                  for i in range(0, self.n_clusters, self.batch_size)]
        batches = []
        for grp in groups:
            mask = np.isin(self.part, grp)
            nodes = np.nonzero(mask)[0]
            batches.append(self._induced(nodes))
        # unify static e_pad across epoch
        e_max = max(b[0].shape[1] if b[0].shape[1] else 1 for b in batches)
        if self.e_pad is None or e_max > self.e_pad:
            self.e_pad = _bucket(e_max)
        x_full = None if self.graph.x is None else np.asarray(self.graph.x)
        y_full = None if self.graph.y is None else np.asarray(self.graph.y)
        tm = None if self.graph.train_mask is None else np.asarray(self.graph.train_mask)
        for ei, nodes, w in batches:
            g = from_coo(ei, num_nodes=nodes.shape[0], edge_weight=w,
                         n_pad=self.n_pad, e_pad=self.e_pad,
                         meta={"num_classes": self.graph.num_classes})
            import jax.numpy as jnp

            def pad_nodes(a, fill=0):
                if a is None:
                    return None
                out = np.full((self.n_pad,) + a.shape[1:], fill, a.dtype)
                out[: nodes.shape[0]] = a[nodes]
                return jnp.asarray(out)

            yield g.replace(x=pad_nodes(x_full), y=pad_nodes(y_full),
                            train_mask=pad_nodes(tm, False))

    def _induced(self, nodes: np.ndarray):
        sel = np.zeros(self.graph.num_nodes, bool)
        sel[nodes] = True
        emask = sel[self._row] & sel[self._col]
        r, c, w = self._row[emask], self._col[emask], self._w[emask]
        relabel = np.full(self.graph.num_nodes, -1, np.int64)
        relabel[nodes] = np.arange(nodes.shape[0])
        return np.stack([relabel[r], relabel[c]]), nodes, w


def saint_node_subgraph(graph: Graph, size: int, rng) -> np.ndarray:
    """GraphSAINT node sampler: uniform node set."""
    return rng.choice(graph.num_nodes, size=size, replace=False)


def saint_walk_subgraph(graph: Graph, roots: int, length: int, rng) -> np.ndarray:
    """GraphSAINT random-walk sampler: nodes touched by short walks."""
    indptr, indices, _ = graph_csr(graph)
    starts = rng.choice(graph.num_nodes, size=roots)
    nodes = [starts]
    cur = starts
    deg = np.diff(indptr)
    for _ in range(length):
        d = deg[cur]
        off = (rng.random(cur.shape[0]) * np.maximum(d, 1)).astype(np.int64)
        nxt = indices[indptr[cur] + np.minimum(off, np.maximum(d - 1, 0))]
        cur = np.where(d > 0, nxt, cur)
        nodes.append(cur)
    return np.unique(np.concatenate(nodes))


def random_partition_batches(graph: Graph, n_parts: int, seed: int = 0
                             ) -> Iterator[Graph]:
    """Random node partition → induced subgraphs
    (reference RandomPartitionDataset, sampler.py:272)."""
    rng = np.random.default_rng(seed)
    part = rng.integers(0, n_parts, graph.num_nodes)
    loader = ClusterLoader.__new__(ClusterLoader)
    loader.graph = graph
    loader.part = part
    loader.n_clusters = n_parts
    loader.batch_size = 1
    loader.rng = rng
    E = graph.num_edges
    loader._row = np.asarray(graph.row)[:E]
    loader._col = np.asarray(graph.col)[:E]
    loader._w = np.asarray(graph.edge_weight)[:E]
    counts = np.bincount(part, minlength=n_parts)
    loader.n_pad = _bucket(int(counts.max()) + 1)
    loader.e_pad = None
    return loader.epoch()
