"""Static-shape graph container — the TPU-native replacement for the reference's
mutable ``Graph``/``Adjacency`` pair (reference: cogdl/data/data.py:134,474).

Design (SURVEY.md §7):
  * CSR is the canonical adjacency form: ``row_ptr[int32, N_pad+1]``,
    ``col[int32, E_pad]``; the sorted-COO destination vector ``row[int32, E_pad]``
    is kept alongside because XLA segment ops consume it directly
    (``indices_are_sorted=True``).
  * Everything is **statically shaped**: nodes are padded to ``n_pad`` and edges
    to ``e_pad`` (bucketed so jit retraces rarely). Padding contract:
      - pad nodes occupy rows [num_nodes, n_pad); their features are zero and
        every node mask is False there.
      - pad edges point at the *sink node* ``n_pad - 1`` (guaranteed to be a pad
        node whenever pad edges exist) with ``edge_weight == 0``, so weighted
        aggregation needs no masking branch at all.
  * Normalisation is a pure function returning a re-weighted graph (the
    reference caches ``__in_norm__/__out_norm__`` degree vectors,
    data.py:240-258; we fold the norm into ``edge_weight`` once, on device).
  * The structure is a registered dataclass pytree: array fields are leaves,
    counts are static aux data, so ``jit``/``vmap``/``shard_map`` compose.

Construction happens on host with numpy (sort, dedup, padding); the result is
moved to device once. All subsequent transforms are jax-pure.
"""

from __future__ import annotations

import dataclasses
from contextlib import contextmanager
from dataclasses import dataclass
from functools import partial
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "Graph",
    "from_coo",
    "sym_norm",
    "row_norm",
    "col_norm",
    "add_self_loops",
    "remove_self_loops",
    "to_undirected",
    "reverse",
    "reorder",
    "pad_to",
]


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _bucket(x: int, minimum: int = 8) -> int:
    """Next power-of-two-ish bucket ≥ x (1.0x–2.0x overhead, few recompiles)."""
    if x <= minimum:
        return minimum
    p = 1 << (int(x - 1).bit_length())
    # refine with quarter-steps between powers of two: 1.0, 1.25, 1.5, 1.75
    for frac in (p // 2 + p // 8, p // 2 + p // 4, p // 2 + 3 * p // 8):
        if x <= frac:
            return frac
    return p


@partial(
    jax.tree_util.register_dataclass,
    data_fields=[
        "row_ptr",
        "row",
        "col",
        "edge_weight",
        "edge_attr",
        "edge_type",
        "x",
        "y",
        "train_mask",
        "val_mask",
        "test_mask",
        "extras",
    ],
    meta_fields=["num_nodes", "num_edges", "meta"],
)
@dataclass(frozen=True)
class Graph:
    """Immutable, statically shaped graph.

    Array shapes (with ``N = n_pad`` padded nodes, ``E = e_pad`` padded edges):
      row_ptr:  int32[N + 1]   CSR pointer over *destination* nodes
      row:      int32[E]       destination node of each edge (sorted, CSR order)
      col:      int32[E]       source node of each edge
      edge_weight: float32[E]  0.0 on pad edges
      x:        float[N, F]    node features (zeros on pad nodes), optional
      y:        int32[N] or float[N, C]  labels, optional
      *_mask:   bool[N]        split masks, optional
      edge_attr: float[E, D]   optional per-edge features
      edge_type: int32[E]      optional relation ids (R-GCN / KG graphs)
      extras:   dict of extra node/edge arrays (leaf dict)

    Static metadata:
      num_nodes, num_edges: the *real* counts (pre-padding)
      meta: hashable extra info (e.g. num_classes, dataset name)
    """

    row_ptr: jnp.ndarray
    row: jnp.ndarray
    col: jnp.ndarray
    edge_weight: jnp.ndarray
    num_nodes: int
    num_edges: int
    edge_attr: Optional[jnp.ndarray] = None
    edge_type: Optional[jnp.ndarray] = None
    x: Optional[jnp.ndarray] = None
    y: Optional[jnp.ndarray] = None
    train_mask: Optional[jnp.ndarray] = None
    val_mask: Optional[jnp.ndarray] = None
    test_mask: Optional[jnp.ndarray] = None
    extras: Optional[Dict[str, jnp.ndarray]] = None
    meta: Tuple[Tuple[str, Any], ...] = ()

    # -- static sizes -------------------------------------------------------
    @property
    def n_pad(self) -> int:
        return int(self.row_ptr.shape[0]) - 1

    @property
    def e_pad(self) -> int:
        return int(self.col.shape[0])

    @property
    def num_features(self) -> int:
        if self.x is None:
            raise ValueError("graph has no node features")
        return int(self.x.shape[-1])

    def meta_get(self, key: str, default=None):
        for k, v in self.meta:
            if k == key:
                return v
        return default

    @property
    def num_classes(self) -> Optional[int]:
        return self.meta_get("num_classes")

    # -- masks & degrees ----------------------------------------------------
    def node_mask(self) -> jnp.ndarray:
        """bool[N_pad]: True on real nodes."""
        return jnp.arange(self.n_pad, dtype=jnp.int32) < self.num_nodes

    def edge_mask(self) -> jnp.ndarray:
        """bool[E_pad]: True on real edges."""
        return jnp.arange(self.e_pad, dtype=jnp.int32) < self.num_edges

    def in_degrees(self, weighted: bool = False) -> jnp.ndarray:
        """Degree of each node as a destination (CSR row lengths)."""
        if weighted:
            return jax.ops.segment_sum(
                self.edge_weight, self.row, num_segments=self.n_pad,
                indices_are_sorted=True,
            )
        return (self.row_ptr[1:] - self.row_ptr[:-1]).astype(jnp.float32)

    def out_degrees(self, weighted: bool = False) -> jnp.ndarray:
        w = self.edge_weight if weighted else self.edge_mask().astype(jnp.float32)
        return jax.ops.segment_sum(w, self.col, num_segments=self.n_pad)

    def replace(self, **kw) -> "Graph":
        return dataclasses.replace(self, **kw)

    def with_meta(self, **kw) -> "Graph":
        d = dict(self.meta)
        d.update(kw)
        return self.replace(meta=tuple(sorted(d.items())))

    def __repr__(self) -> str:  # short, shape-centric
        parts = [f"Graph(nodes={self.num_nodes}/{self.n_pad}, edges={self.num_edges}/{self.e_pad}"]
        if self.x is not None:
            parts.append(f", x={tuple(self.x.shape)}")
        if self.y is not None:
            parts.append(f", y={tuple(self.y.shape)}")
        return "".join(parts) + ")"


# ---------------------------------------------------------------------------
# Host-side construction
# ---------------------------------------------------------------------------

def from_coo(
    edge_index,
    num_nodes: Optional[int] = None,
    edge_weight=None,
    edge_attr=None,
    edge_type=None,
    x=None,
    y=None,
    train_mask=None,
    val_mask=None,
    test_mask=None,
    n_pad: Optional[int] = None,
    e_pad: Optional[int] = None,
    bucket: bool = True,
    coalesce: bool = False,
    meta: Optional[Dict[str, Any]] = None,
) -> Graph:
    """Build a :class:`Graph` from a COO edge list (host-side, numpy).

    ``edge_index`` is ``(2, E)`` with ``edge_index[0] = destination (row)`` and
    ``edge_index[1] = source (col)`` — the reference's convention where
    ``spmm`` aggregates sources into destinations over CSR rows
    (reference: cogdl/data/data.py:306-309, utils/spmm_utils.py:43-52).
    """
    ei = np.asarray(edge_index)
    if ei.ndim != 2 or ei.shape[0] != 2:
        raise ValueError(f"edge_index must be (2, E), got {ei.shape}")
    row, col = ei[0].astype(np.int64), ei[1].astype(np.int64)
    E = row.shape[0]
    if num_nodes is None:
        num_nodes = int(max(row.max(initial=-1), col.max(initial=-1)) + 1)
        if x is not None:
            num_nodes = max(num_nodes, int(np.asarray(x).shape[0]))
    N = int(num_nodes)

    w = (
        np.ones(E, dtype=np.float32)
        if edge_weight is None
        else np.asarray(edge_weight, dtype=np.float32).reshape(E)
    )
    ea = None if edge_attr is None else np.asarray(edge_attr)
    et = None if edge_type is None else np.asarray(edge_type, dtype=np.int32).reshape(E)

    # sort by (row, col) → CSR order
    order = np.lexsort((col, row))
    row, col, w = row[order], col[order], w[order]
    if ea is not None:
        ea = ea[order]
    if et is not None:
        et = et[order]

    if coalesce and E > 0:
        key = row * N + col
        uniq, inv = np.unique(key, return_inverse=True)
        w = np.bincount(inv, weights=w, minlength=uniq.shape[0]).astype(np.float32)
        row = (uniq // N).astype(np.int64)
        col = (uniq % N).astype(np.int64)
        if ea is not None or et is not None:
            # keep the first occurrence's attributes (sentinel must be LARGER
            # than any index or minimum.at never updates it)
            first = np.full(uniq.shape[0], inv.shape[0], dtype=np.int64)
            np.minimum.at(first, inv, np.arange(inv.shape[0]))
            if ea is not None:
                ea = ea[first]
            if et is not None:
                et = et[first]
        E = row.shape[0]

    # padded sizes
    if n_pad is None:
        n_pad = _bucket(N + 1) if bucket else N + 1
    if e_pad is None:
        e_pad = _bucket(max(E, 1)) if bucket else max(E, 1)
    n_pad = max(n_pad, N + (1 if e_pad > E else 0))
    e_pad = max(e_pad, E)
    sink = n_pad - 1

    row_p = np.full(e_pad, sink, dtype=np.int32)
    col_p = np.full(e_pad, sink, dtype=np.int32)
    w_p = np.zeros(e_pad, dtype=np.float32)
    row_p[:E], col_p[:E], w_p[:E] = row, col, w

    # CSR pointer over padded rows: pad edges all live in the sink row.
    counts = np.bincount(row_p, minlength=n_pad)
    row_ptr = np.zeros(n_pad + 1, dtype=np.int32)
    np.cumsum(counts, out=row_ptr[1:])

    def _pad_nodes(a, fill=0):
        if a is None:
            return None
        a = np.asarray(a)
        if a.shape[0] == n_pad:
            return a
        pad_shape = (n_pad - a.shape[0],) + a.shape[1:]
        return np.concatenate([a, np.full(pad_shape, fill, dtype=a.dtype)], axis=0)

    def _pad_edges(a, fill=0):
        if a is None:
            return None
        a = np.asarray(a)
        if a.shape[0] == e_pad:
            return a
        pad_shape = (e_pad - a.shape[0],) + a.shape[1:]
        return np.concatenate([a, np.full(pad_shape, fill, dtype=a.dtype)], axis=0)

    xx = _pad_nodes(None if x is None else np.asarray(x, dtype=np.float32))
    yy = _pad_nodes(y)
    tm = _pad_nodes(None if train_mask is None else np.asarray(train_mask, dtype=bool), False)
    vm = _pad_nodes(None if val_mask is None else np.asarray(val_mask, dtype=bool), False)
    sm = _pad_nodes(None if test_mask is None else np.asarray(test_mask, dtype=bool), False)
    ea = _pad_edges(ea)
    et = _pad_edges(et)

    meta_d = dict(meta or {})
    if et is not None and E > 0 and "num_relations" not in meta_d:
        # record the relation count so typed models (RGCN/Simple-HGN) size
        # their embedding tables correctly instead of clipping ids
        meta_d["num_relations"] = int(et[:E].max()) + 1
    meta_t = tuple(sorted(meta_d.items()))
    return Graph(
        row_ptr=jnp.asarray(row_ptr),
        row=jnp.asarray(row_p),
        col=jnp.asarray(col_p),
        edge_weight=jnp.asarray(w_p),
        edge_attr=None if ea is None else jnp.asarray(ea),
        edge_type=None if et is None else jnp.asarray(et),
        x=None if xx is None else jnp.asarray(xx),
        y=None if yy is None else jnp.asarray(yy),
        train_mask=None if tm is None else jnp.asarray(tm),
        val_mask=None if vm is None else jnp.asarray(vm),
        test_mask=None if sm is None else jnp.asarray(sm),
        num_nodes=N,
        num_edges=int(E),
        meta=meta_t,
    )


# ---------------------------------------------------------------------------
# Pure-jax structural transforms
# ---------------------------------------------------------------------------

def sym_norm(g: Graph, add_self_loops_first: bool = False) -> Graph:
    """GCN symmetric normalisation ``D^-1/2 A D^-1/2`` folded into edge_weight.

    Matches reference ``Adjacency.normalize_adj("sym")`` (data.py:220-258)
    with zero-degree guard. Idempotent: tags the graph (static meta) so models
    calling it on an already-normalised graph pay nothing — the analog of the
    reference's cached ``__*_norm__`` vectors, but jit-free-of-charge.
    """
    if g.meta_get("norm") == "sym":
        return g
    if add_self_loops_first:
        g = add_self_loops(g)
    deg = g.in_degrees(weighted=True)
    inv_sqrt = jnp.where(deg > 0, jax.lax.rsqrt(jnp.maximum(deg, 1e-12)), 0.0)
    w = g.edge_weight * inv_sqrt[g.row] * inv_sqrt[g.col]
    return g.replace(edge_weight=w).with_meta(norm="sym")


def row_norm(g: Graph) -> Graph:
    """Random-walk normalisation ``D^-1 A`` (destination-degree)."""
    if g.meta_get("norm") == "row":
        return g
    deg = g.in_degrees(weighted=True)
    inv = jnp.where(deg > 0, 1.0 / jnp.maximum(deg, 1e-12), 0.0)
    return g.replace(edge_weight=g.edge_weight * inv[g.row]).with_meta(norm="row")


def col_norm(g: Graph) -> Graph:
    """``A D^-1`` (source-degree) normalisation."""
    if g.meta_get("norm") == "col":
        return g
    deg = g.out_degrees(weighted=True)
    inv = jnp.where(deg > 0, 1.0 / jnp.maximum(deg, 1e-12), 0.0)
    return g.replace(edge_weight=g.edge_weight * inv[g.col]).with_meta(norm="col")


def add_self_loops(g: Graph, fill_value: float = 1.0,
                   loop_type: int = 0) -> Graph:
    """Host-side: rebuild graph with one self loop per real node (replacing any
    existing self loops). Reference: ``add_remaining_self_loops`` data.py:175-218.
    Per-edge attrs follow their edges; loops get zero attrs / ``loop_type``.
    """
    row = np.asarray(g.row)[: g.num_edges]
    col = np.asarray(g.col)[: g.num_edges]
    w = np.asarray(g.edge_weight)[: g.num_edges]
    keep = row != col
    loops = np.arange(g.num_nodes, dtype=np.int64)
    new_row = np.concatenate([row[keep], loops])
    new_col = np.concatenate([col[keep], loops])
    new_w = np.concatenate([w[keep], np.full(g.num_nodes, fill_value, np.float32)])
    ea, et = _edge_data(g)
    if ea is not None:
        ea = np.concatenate(
            [ea[keep], np.zeros((g.num_nodes,) + ea.shape[1:], ea.dtype)])
    if et is not None:
        et = np.concatenate(
            [et[keep], np.full(g.num_nodes, loop_type, et.dtype)])
    return _rebuild_structure(g, new_row, new_col, new_w, ea, et)


def remove_self_loops(g: Graph) -> Graph:
    row = np.asarray(g.row)[: g.num_edges]
    col = np.asarray(g.col)[: g.num_edges]
    w = np.asarray(g.edge_weight)[: g.num_edges]
    keep = row != col
    ea, et = _edge_data(g)
    return _rebuild_structure(g, row[keep], col[keep], w[keep],
                              None if ea is None else ea[keep],
                              None if et is None else et[keep])


def to_undirected(g: Graph) -> Graph:
    """Host-side symmetrisation: add reversed edges, coalesce duplicates."""
    row = np.asarray(g.row)[: g.num_edges]
    col = np.asarray(g.col)[: g.num_edges]
    w = np.asarray(g.edge_weight)[: g.num_edges]
    new_row = np.concatenate([row, col])
    new_col = np.concatenate([col, row])
    new_w = np.concatenate([w, w])
    key = new_row * g.num_nodes + new_col
    _, first = np.unique(key, return_index=True)
    ea, et = _edge_data(g)
    if ea is not None:
        ea = np.concatenate([ea, ea])[first]
    if et is not None:
        et = np.concatenate([et, et])[first]
    return _rebuild_structure(g, new_row[first], new_col[first], new_w[first],
                              ea, et)


def reverse(g: Graph) -> Graph:
    """Transposed graph (CSC of the original): used by SpMM backward."""
    row = np.asarray(g.row)[: g.num_edges]
    col = np.asarray(g.col)[: g.num_edges]
    w = np.asarray(g.edge_weight)[: g.num_edges]
    ea, et = _edge_data(g)
    return _rebuild_structure(g, col, row, w, ea, et)


def reorder_permutation(row: np.ndarray, col: np.ndarray, num_nodes: int,
                        method: str = "degree",
                        seed: int = 0) -> np.ndarray:
    """The node permutation behind :func:`reorder` (new id i ← old id
    ``perm[i]``), shared with the synthetic generators' pre-device-transfer
    relabeling (`datasets.synthetic._relabel_coo`). ``row``/``col`` are the
    real (unpadded) COO edges."""
    N = num_nodes
    if method == "degree":
        deg = np.bincount(row, minlength=N) + np.bincount(col, minlength=N)
        perm = np.argsort(-deg, kind="stable").astype(np.int64)
    elif method == "random":
        perm = np.random.default_rng(seed).permutation(N).astype(np.int64)
    elif method in ("bfs", "rcm"):
        import scipy.sparse as sp
        from scipy.sparse import csgraph

        w = np.ones(row.shape[0], np.float32)
        adj = sp.csr_matrix((w, (row, col)), shape=(N, N))
        adj = adj + adj.T
        if method == "rcm":
            perm = np.asarray(csgraph.reverse_cuthill_mckee(adj), np.int64)
        else:
            deg = np.bincount(row, minlength=N) + np.bincount(col,
                                                              minlength=N)
            order = csgraph.breadth_first_order(
                adj, int(np.argmax(deg)), directed=False,
                return_predecessors=False)
            seen = np.zeros(N, bool)
            seen[order] = True
            rest = np.nonzero(~seen)[0]  # disconnected components appended
            perm = np.concatenate([order, rest]).astype(np.int64)
    else:
        raise ValueError(f"unknown reorder method {method!r}")
    return perm


def reorder(g: Graph, method: str = "degree", seed: int = 0) -> Graph:
    """Relabel nodes to improve gather locality / hot-table concentration
    (host-side). The TPU motivation: XLA stages gather tables ≤ ~100 MB in
    VMEM (fast path); concentrating high-traffic rows at low ids keeps the
    hot working set / source panels stageable at scale. (The reference has no
    analog — METIS at cogdl/data/sampler.py:188 partitions but never
    relabels the training graph.)

    methods:
      ``degree``  — descending total degree (hubs first; the order the
                    synthetic Zipf benchmarks are already born with)
      ``bfs``     — breadth-first order from the highest-degree node
                    (community locality)
      ``rcm``     — scipy reverse Cuthill–McKee (bandwidth minimisation)
      ``random``  — a seeded shuffle (A/B baseline: what a real-world
                    arbitrary labeling looks like)

    Returns a new Graph with permuted node data and rebuilt adjacency;
    ``extras['reorder_orig']`` maps new id → original id so predictions can
    be un-permuted, and meta ``reorder=<method>`` tags the graph.
    """
    N = g.num_nodes
    E = g.num_edges
    row = np.asarray(g.row)[:E].astype(np.int64)
    col = np.asarray(g.col)[:E].astype(np.int64)
    perm = reorder_permutation(row, col, N, method, seed)

    rank = np.empty(N, np.int64)
    rank[perm] = np.arange(N)
    ea, et = _edge_data(g)
    w = np.asarray(g.edge_weight)[:E]
    ng = from_coo(
        np.stack([rank[row], rank[col]]), num_nodes=N, edge_weight=w,
        edge_attr=ea, edge_type=et,
        meta={k: v for k, v in g.meta if k not in (
            "spmm_panel_rows", "spmm_r_tile", "spmm_gather_bf16")},
    )

    def take(a):
        if a is None:
            return None
        return _repad_nodes(jnp.asarray(np.asarray(a)[perm]), ng.n_pad)

    extras = {k: v for k, v in (g.extras or {}).items()
              if not k.startswith("spmm_")}
    # chained reorders compose: new id → THIS graph's id → original id
    prev = extras.get("reorder_orig")
    orig = (perm if prev is None
            else np.asarray(prev)[:N].astype(np.int64)[perm])
    extras["reorder_orig"] = _repad_nodes(
        jnp.asarray(orig.astype(np.int32)), ng.n_pad)
    return ng.replace(
        x=take(g.x), y=take(g.y), train_mask=take(g.train_mask),
        val_mask=take(g.val_mask), test_mask=take(g.test_mask),
        extras=extras,
    ).with_meta(reorder=method)


def _edge_data(g: Graph):
    """Per-edge attr/type sliced to real edges (numpy), or None."""
    ea = None if g.edge_attr is None else np.asarray(g.edge_attr)[: g.num_edges]
    et = None if g.edge_type is None else np.asarray(g.edge_type)[: g.num_edges]
    return ea, et


def _rebuild_structure(g: Graph, row, col, w, ea=None, et=None) -> Graph:
    """Rebuild adjacency arrays, keeping node data; host-side.
    Any cached normalisation tag is dropped (edges changed), as are kernel
    layouts in extras (``spmm_*`` — they index the OLD edge order); node-
    level extras are kept."""
    ng = from_coo(
        np.stack([row, col]),
        num_nodes=g.num_nodes,
        edge_weight=w,
        edge_attr=ea,
        edge_type=et,
        n_pad=None,
        bucket=True,
    )
    extras = g.extras
    if extras:
        extras = {k: v for k, v in extras.items()
                  if not k.startswith("spmm_")} or None
    return ng.replace(
        x=g.x if g.x is None or g.x.shape[0] == ng.n_pad else _repad_nodes(g.x, ng.n_pad),
        y=_repad_nodes(g.y, ng.n_pad),
        train_mask=_repad_nodes(g.train_mask, ng.n_pad),
        val_mask=_repad_nodes(g.val_mask, ng.n_pad),
        test_mask=_repad_nodes(g.test_mask, ng.n_pad),
        extras=extras,
        meta=tuple((k, v) for k, v in g.meta
                   if k not in ("norm", "spmm_panel_rows", "spmm_r_tile",
                                "spmm_gather_bf16")),
    )


def _repad_nodes(a, n_pad: int):
    if a is None:
        return None
    if a.shape[0] == n_pad:
        return a
    if a.shape[0] > n_pad:
        return a[:n_pad]
    pad = [(0, n_pad - a.shape[0])] + [(0, 0)] * (a.ndim - 1)
    return jnp.pad(a, pad)


def pad_to(g: Graph, n_pad: int, e_pad: int) -> Graph:
    """Repad an existing graph to larger static sizes (host-side)."""
    if n_pad < g.n_pad or e_pad < g.e_pad:
        raise ValueError("pad_to can only grow the static shapes")
    row = np.asarray(g.row)[: g.num_edges]
    col = np.asarray(g.col)[: g.num_edges]
    w = np.asarray(g.edge_weight)[: g.num_edges]
    ng = from_coo(
        np.stack([row, col]), num_nodes=g.num_nodes, edge_weight=w,
        n_pad=n_pad, e_pad=e_pad, bucket=False,
    )
    return ng.replace(
        x=_repad_nodes(g.x, ng.n_pad),
        y=_repad_nodes(g.y, ng.n_pad),
        train_mask=_repad_nodes(g.train_mask, ng.n_pad),
        val_mask=_repad_nodes(g.val_mask, ng.n_pad),
        test_mask=_repad_nodes(g.test_mask, ng.n_pad),
        extras=g.extras,
        meta=g.meta,
    )


# -- exports / subgraphs / scoped mutation (reference data.py:411-925) --------

def to_scipy(g: Graph):
    """scipy CSR of the real (unpadded) adjacency — reference
    Adjacency.to_scipy_csr (data/data.py:411)."""
    import scipy.sparse as sp

    E = g.num_edges
    row = np.asarray(g.row)[:E]
    col = np.asarray(g.col)[:E]
    w = (np.ones(E, np.float32) if g.edge_weight is None
         else np.asarray(g.edge_weight)[:E])
    N = g.num_nodes
    return sp.csr_matrix((w, (row, col)), shape=(N, N))


def to_networkx(g: Graph):
    """networkx DiGraph export — reference Adjacency.to_networkx
    (data/data.py:424)."""
    import networkx as nx

    E = g.num_edges
    G = nx.DiGraph()
    G.add_nodes_from(range(g.num_nodes))
    row = np.asarray(g.row)[:E]
    col = np.asarray(g.col)[:E]
    if g.edge_weight is not None:
        w = np.asarray(g.edge_weight)[:E]
        G.add_weighted_edges_from(zip(col.tolist(), row.tolist(), w.tolist()))
    else:
        G.add_edges_from(zip(col.tolist(), row.tolist()))
    return G


def subgraph(g: Graph, nodes) -> Graph:
    """Node-induced subgraph with relabeled ids — reference Graph.subgraph /
    csr_subgraph (data/data.py:850-905). Host-side; returns a freshly padded
    Graph whose node data rows follow ``nodes`` order."""
    nodes = np.asarray(nodes, np.int64)
    E = g.num_edges
    row = np.asarray(g.row)[:E]
    col = np.asarray(g.col)[:E]
    new_id = np.full(g.n_pad, -1, np.int64)
    new_id[nodes] = np.arange(nodes.size)
    keep = (new_id[row] >= 0) & (new_id[col] >= 0)
    ea, et = _edge_data(g)
    w = None if g.edge_weight is None else np.asarray(g.edge_weight)[:E][keep]
    ng = from_coo(
        np.stack([new_id[row[keep]], new_id[col[keep]]]),
        num_nodes=nodes.size, edge_weight=w,
        edge_attr=None if ea is None else ea[keep],
        edge_type=None if et is None else et[keep],
        meta={k: v for k, v in g.meta if k not in (
            "norm", "spmm_panel_rows", "spmm_r_tile", "spmm_gather_bf16")},
    )

    def take(a):
        if a is None:
            return None
        out = np.asarray(a)[nodes]
        return _repad_nodes(jnp.asarray(out), ng.n_pad)

    return ng.replace(x=take(g.x), y=take(g.y), train_mask=take(g.train_mask),
                      val_mask=take(g.val_mask), test_mask=take(g.test_mask))


def edge_subgraph(g: Graph, edge_idx, relabel: bool = True) -> Graph:
    """Subgraph induced by an EDGE index set — reference Graph.edge_subgraph
    (data/data.py:907-925). With ``relabel`` the endpoint set is compacted
    like the reference's ``require_idx`` path."""
    edge_idx = np.asarray(edge_idx, np.int64)
    E = g.num_edges
    row = np.asarray(g.row)[:E][edge_idx]
    col = np.asarray(g.col)[:E][edge_idx]
    if relabel:
        nodes = np.unique(np.concatenate([row, col]))
        return subgraph(g, nodes) if nodes.size else g
    ea, et = _edge_data(g)
    w = (None if g.edge_weight is None
         else np.asarray(g.edge_weight)[:E][edge_idx])
    return _rebuild_structure(
        g, row, col, w,
        None if ea is None else ea[edge_idx],
        None if et is None else et[edge_idx])


@contextmanager
def local_graph(g: Graph, **overrides):
    """Scoped-mutation analog of the reference's ``Graph.local_graph``
    context manager (data/data.py:594-604). Graphs here are immutable
    pytrees, so "temporary mutation" is just a modified copy whose lifetime
    the ``with`` block makes explicit:

    >>> with local_graph(g, edge_weight=w2) as g2:
    ...     out = model(g2)
    """
    yield g.replace(**overrides)
