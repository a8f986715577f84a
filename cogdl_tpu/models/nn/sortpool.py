"""SortPool (DGCNN) — sort-based readout + 1-D conv classifier
(reference cogdl/models/nn/sortpool.py). TPU-first: per-graph top-k selection
over the union batch via segment-aware masking + lax.top_k."""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...data.graph import Graph
from ...layers import GCNLayer
from ...ops import segment as seg


class SortPool(nn.Module):
    in_features: int
    out_features: int
    hidden_size: int = 32
    num_layers: int = 3
    k: int = 16
    dropout: float = 0.3

    @nn.compact
    def __call__(self, graph: Graph, x: Optional[jnp.ndarray] = None,
                 training: bool = False):
        if x is None:
            x = graph.x
        graph_id = graph.extras["graph_id"]
        num_graphs = graph.meta_get("num_graphs", 1)

        hs = []
        h = x
        for i in range(self.num_layers):
            h = GCNLayer(self.hidden_size, activation="tanh",
                         name=f"gcn{i}")(graph, h, training)
            hs.append(h)
        h = jnp.concatenate(hs, axis=-1)               # [N, L*H]

        # sort key = last channel; gather per-graph top-k with one-hot trick:
        # for each graph g build score masked to its nodes, take top-k rows.
        key = h[:, -1]
        one_hot_g = jax.nn.one_hot(graph_id, num_graphs, dtype=h.dtype)  # [N, G]
        big_neg = -1e30
        # scores per graph: [G, N]
        per_g = jnp.where(one_hot_g.T > 0, key[None, :], big_neg)
        _, idx = jax.lax.top_k(per_g, self.k)          # [G, k]
        feats = h[idx.reshape(-1)].reshape(num_graphs, self.k, h.shape[-1])
        valid = jnp.take_along_axis(per_g, idx, axis=1) > big_neg / 2
        feats = feats * valid[:, :, None]

        z = feats.reshape(num_graphs, -1)
        z = nn.Dense(self.hidden_size * 2, name="fc1")(z)
        z = nn.relu(z)
        if self.dropout > 0 and training:
            z = nn.Dropout(rate=self.dropout, deterministic=False)(z)
        return nn.Dense(self.out_features, name="out")(z)
