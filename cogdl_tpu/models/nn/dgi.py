"""DGI: Deep Graph Infomax — rebuild of reference cogdl/models/nn/dgi.py.

GCN encoder, readout = sigmoid(mean), bilinear discriminator between node
embeddings and the graph summary; corruption = feature row shuffle.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...data.graph import Graph, sym_norm
from ...layers import GCNLayer


class DGIEncoder(nn.Module):
    hidden_size: int = 512

    @nn.compact
    def __call__(self, graph: Graph, x: jnp.ndarray, training: bool = False):
        g = sym_norm(graph)
        return GCNLayer(self.hidden_size, activation="prelu", name="gcn")(
            g, x, training)


class DGI(nn.Module):
    in_features: int
    out_features: int = 0     # unused (self-supervised)
    hidden_size: int = 512

    def setup(self):
        self.encoder = DGIEncoder(self.hidden_size)
        self.disc = nn.Dense(self.hidden_size, use_bias=False, name="disc")

    def __call__(self, graph: Graph, x: Optional[jnp.ndarray] = None,
                 training: bool = False):
        if x is None:
            x = graph.x
        return self.encoder(graph, x, training)

    def infomax_logits(self, graph: Graph, x: jnp.ndarray, x_corrupt: jnp.ndarray,
                       training: bool = True):
        """Positive/negative discriminator scores for the BCE infomax loss."""
        h_pos = self.encoder(graph, x, training)
        h_neg = self.encoder(graph, x_corrupt, training)
        mask = graph.node_mask().astype(h_pos.dtype)[:, None]
        summary = jax.nn.sigmoid(
            (h_pos * mask).sum(0) / jnp.maximum(mask.sum(), 1.0))
        sw = self.disc(summary)
        pos = h_pos @ sw
        neg = h_neg @ sw
        return pos, neg

    def embed(self, graph: Graph, x: Optional[jnp.ndarray] = None):
        if x is None:
            x = graph.x
        return self.encoder(graph, x, False)
