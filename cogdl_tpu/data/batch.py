"""Multi-graph batching: disconnected-union of many graphs with static bucket
shapes — rebuild of reference ``Batch.from_data_list`` (cogdl/data/batch.py:26)
with TPU static-shape discipline: every batch in an epoch is padded to shared
bucket sizes so jit compiles once.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import numpy as np

from .graph import Graph, from_coo, _bucket


def union_batch(
    graphs: Sequence[Graph],
    labels: Optional[np.ndarray] = None,
    n_pad: Optional[int] = None,
    e_pad: Optional[int] = None,
    num_graphs_pad: Optional[int] = None,
) -> Graph:
    """Concatenate graphs into one disconnected union Graph.

    Node indices are offset per graph; ``extras['graph_id'][v]`` maps each node
    to its graph (pad nodes map to ``num_graphs_pad - 1``, a dummy slot whose
    pooled logits are masked by ``extras['graph_mask']``). Per-graph labels go
    to ``extras['graph_y']``.
    """
    rows, cols, ws, xs = [], [], [], []
    gids = []
    off = 0
    for gi, g in enumerate(graphs):
        E, N = g.num_edges, g.num_nodes
        rows.append(np.asarray(g.row)[:E] + off)
        cols.append(np.asarray(g.col)[:E] + off)
        ws.append(np.asarray(g.edge_weight)[:E])
        if g.x is not None:
            xs.append(np.asarray(g.x)[:N])
        gids.append(np.full(N, gi, np.int32))
        off += N
    row = np.concatenate(rows) if rows else np.zeros(0, np.int64)
    col = np.concatenate(cols) if cols else np.zeros(0, np.int64)
    w = np.concatenate(ws) if ws else np.zeros(0, np.float32)
    x = np.concatenate(xs) if xs else None
    gid = np.concatenate(gids) if gids else np.zeros(0, np.int32)

    G = len(graphs)
    G_pad = num_graphs_pad or _bucket(G + 1)
    g_union = from_coo(
        np.stack([row, col]), num_nodes=off, edge_weight=w, x=x,
        n_pad=n_pad, e_pad=e_pad,
        meta={"num_graphs": G_pad,
              "num_classes": graphs[0].meta_get("num_classes")},
    )
    gid_pad = np.full(g_union.n_pad, G_pad - 1, np.int32)
    gid_pad[:off] = gid
    graph_mask = np.zeros(G_pad, bool)
    graph_mask[:G] = True
    y = np.zeros(G_pad, np.int32)
    if labels is not None:
        y[:G] = np.asarray(labels[: G], np.int32)

    import jax.numpy as jnp

    return g_union.replace(extras={
        "graph_id": jnp.asarray(gid_pad),
        "graph_mask": jnp.asarray(graph_mask),
        "graph_y": jnp.asarray(y),
    })


def make_batches(
    graphs: Sequence[Graph],
    labels: Optional[np.ndarray],
    batch_size: int,
    shuffle: bool = True,
    seed: int = 0,
) -> List[Graph]:
    """Split into union batches sharing one static shape across the epoch."""
    idx = np.arange(len(graphs))
    if shuffle:
        np.random.default_rng(seed).shuffle(idx)
    chunks = [idx[i: i + batch_size] for i in range(0, len(idx), batch_size)]
    # shared bucket: size to the worst-case chunk
    max_nodes = max(sum(graphs[i].num_nodes for i in c) for c in chunks)
    max_edges = max(sum(graphs[i].num_edges for i in c) for c in chunks)
    n_pad = _bucket(max_nodes + 1)
    e_pad = _bucket(max_edges)
    g_pad = _bucket(batch_size + 1)
    out = []
    for c in chunks:
        out.append(union_batch(
            [graphs[i] for i in c],
            None if labels is None else labels[c],
            n_pad=n_pad, e_pad=e_pad, num_graphs_pad=g_pad,
        ))
    return out
