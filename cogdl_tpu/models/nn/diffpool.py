"""DiffPool — differentiable hierarchical pooling for graph classification
(reference cogdl/models/nn/diffpool.py). TPU-first: the assignment matmuls
S^T A S and S^T X are dense batched matmuls over per-graph node blocks; here
the union-batch variant materialises per-graph dense blocks of fixed size."""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...data.graph import Graph
from ...layers import GCNLayer
from ...ops import segment as seg
from ...ops import spmm


class DiffPool(nn.Module):
    in_features: int
    out_features: int
    hidden_size: int = 64
    num_clusters: int = 8
    dropout: float = 0.2

    @nn.compact
    def __call__(self, graph: Graph, x: Optional[jnp.ndarray] = None,
                 training: bool = False):
        if x is None:
            x = graph.x
        graph_id = graph.extras["graph_id"]
        num_graphs = graph.meta_get("num_graphs", 1)
        C = self.num_clusters

        # embed + assign
        z = GCNLayer(self.hidden_size, activation="relu", name="embed")(
            graph, x, training)
        s_logits = GCNLayer(C, name="assign")(graph, x, training)
        s = jax.nn.softmax(s_logits, axis=-1)          # [N, C]
        mask = graph.node_mask().astype(z.dtype)[:, None]
        s = s * mask

        # pooled features per (graph, cluster): X' = S^T Z via segment ops
        # flatten (graph, cluster) into one segment axis of size G*C
        sz = s[:, :, None] * z[:, None, :]             # [N, C, H]
        pooled = seg.segment_sum(sz.reshape(-1, C * self.hidden_size),
                                 graph_id, num_graphs)  # [G, C*H]
        pooled = pooled.reshape(num_graphs, C, self.hidden_size)

        # pooled adjacency A' = S^T A S: first propagate S through A
        As = spmm(graph, s)                            # [N, C]
        # (S^T As)[g] = Σ_v s[v] ⊗ As[v] per graph
        sAs = s[:, :, None] * As[:, None, :]           # [N, C, C]
        A_pool = seg.segment_sum(sAs.reshape(-1, C * C), graph_id, num_graphs)
        A_pool = A_pool.reshape(num_graphs, C, C)

        # dense GNN on the pooled graphs: H = relu(A' P W)
        h = pooled
        for i in range(2):
            h = jnp.einsum("gcd,gdh->gch", A_pool,
                           nn.Dense(self.hidden_size, name=f"dense{i}")(h))
            h = nn.relu(h)
        hg = h.mean(axis=1)                            # [G, H]
        if self.dropout > 0 and training:
            hg = nn.Dropout(rate=self.dropout, deterministic=False)(hg)
        return nn.Dense(self.out_features, name="out")(hg)
