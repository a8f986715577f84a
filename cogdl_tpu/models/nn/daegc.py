"""DAEGC — deep attentional embedded graph clustering
(reference cogdl/models/nn/daegc.py): GAT encoder + reconstruction, with a
soft cluster self-training target available via ``cluster_q``."""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from ...data.graph import Graph
from ...layers import GATLayer


class DAEGC(nn.Module):
    in_features: int
    out_features: int = 0
    hidden_size: int = 256
    emb_size: int = 16
    num_clusters: int = 4

    def setup(self):
        self.conv1 = GATLayer(self.hidden_size, nhead=1, attn_drop=0.0,
                              activation="relu", name="gat1")
        self.conv2 = GATLayer(self.emb_size, nhead=1, attn_drop=0.0,
                              name="gat2")
        self.centers = self.param("centers", nn.initializers.normal(1.0),
                                  (self.num_clusters, self.emb_size))

    def encode(self, graph: Graph, x, training: bool = False):
        h = self.conv1(graph, x, training)
        return self.conv2(graph, h, training)

    def __call__(self, graph: Graph, x: Optional[jnp.ndarray] = None,
                 training: bool = False):
        if x is None:
            x = graph.x
        return self.encode(graph, x, training)

    def decode_edges(self, z, rows, cols):
        return jnp.sum(z[rows] * z[cols], axis=-1)

    def cluster_q(self, z):
        """Student-t soft assignment to cluster centers."""
        d2 = jnp.sum((z[:, None, :] - self.centers[None]) ** 2, -1)
        q = 1.0 / (1.0 + d2)
        return q / jnp.maximum(q.sum(1, keepdims=True), 1e-12)

    def embed(self, graph: Graph, x: Optional[jnp.ndarray] = None):
        if x is None:
            x = graph.x
        return self.encode(graph, x, False)
