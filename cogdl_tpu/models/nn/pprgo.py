"""PPRGo — push-based personalised PageRank + MLP on top-k PPR neighborhoods
(reference cogdl/models/nn/pprgo.py + utils/ppr_utils.py). Full-batch variant:
the PPR matrix is precomputed host-side (topk sparse) and applied as a
fixed-weight aggregation."""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from ...data.graph import Graph
from ...layers import MLP
from ...ops import spmm


def topk_ppr_graph(graph: Graph, alpha: float = 0.25, eps: float = 1e-4,
                   topk: int = 32) -> Graph:
    """Host-side push-flow PPR (Andersen et al.) → top-k sparse PPR adjacency
    stored as a Graph whose edge weights are PPR scores
    (reference utils/ppr_utils.py:39-95)."""
    import scipy.sparse as sp

    from ..emb.base import graph_to_scipy
    from ...data.graph import from_coo

    A = graph_to_scipy(graph)
    N = A.shape[0]
    deg = np.asarray(A.sum(1)).ravel()
    indptr, indices = A.indptr, A.indices
    rows, cols, vals = [], [], []
    for s in range(N):
        p = {}
        r = {s: 1.0}
        frontier = [s]
        while frontier:
            u = frontier.pop()
            ru = r.get(u, 0.0)
            if ru < eps * max(deg[u], 1.0):
                continue
            p[u] = p.get(u, 0.0) + alpha * ru
            push = (1 - alpha) * ru / max(deg[u], 1.0)
            r[u] = 0.0
            for v in indices[indptr[u]: indptr[u + 1]]:
                r[v] = r.get(v, 0.0) + push
                if r[v] >= eps * max(deg[v], 1.0):
                    frontier.append(v)
        top = sorted(p.items(), key=lambda kv: -kv[1])[:topk]
        for v, val in top:
            rows.append(s)
            cols.append(v)
            vals.append(val)
    g = from_coo(np.stack([np.asarray(rows), np.asarray(cols)]),
                 num_nodes=N, edge_weight=np.asarray(vals, np.float32),
                 meta=dict(graph.meta))
    return g.replace(x=graph.x[: g.n_pad] if graph.x.shape[0] >= g.n_pad else graph.x,
                     y=graph.y, train_mask=graph.train_mask,
                     val_mask=graph.val_mask, test_mask=graph.test_mask)


class PPRGo(nn.Module):
    in_features: int
    out_features: int
    hidden_size: int = 64
    num_layers: int = 2
    dropout: float = 0.1
    alpha: float = 0.25

    @nn.compact
    def __call__(self, graph: Graph, x: Optional[jnp.ndarray] = None,
                 training: bool = False):
        if x is None:
            x = graph.x
        h = MLP(self.out_features, hidden_features=self.hidden_size,
                num_layers=self.num_layers, dropout=self.dropout,
                name="mlp")(x, training)
        # aggregate predictions over the (PPR-weighted) adjacency
        return spmm(graph, h)
