"""MVGRL — multi-view (adjacency vs diffusion) contrastive learning
(reference cogdl/models/nn/mvgrl.py). Uses the GDC PPR diffusion as the
second view; DGI-style discriminator across views."""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...data.graph import Graph, sym_norm
from ...layers import GCNLayer


class MVGRL(nn.Module):
    in_features: int
    out_features: int = 0
    hidden_size: int = 512

    def setup(self):
        self.enc_a = GCNLayer(self.hidden_size, activation="prelu", name="enc_a")
        self.enc_d = GCNLayer(self.hidden_size, activation="prelu", name="enc_d")
        self.disc = nn.Dense(self.hidden_size, use_bias=False, name="disc")

    def __call__(self, graph: Graph, x: Optional[jnp.ndarray] = None,
                 training: bool = False):
        if x is None:
            x = graph.x
        g = sym_norm(graph)
        diff = graph.extras["diffusion_graph"] if graph.extras and \
            "diffusion_graph" in graph.extras else g
        return self.enc_a(g, x, training) + self.enc_d(diff, x, training)

    def infomax_logits(self, graph: Graph, x: jnp.ndarray,
                       x_corrupt: jnp.ndarray, training: bool = True):
        g = sym_norm(graph)
        diff = graph.extras["diffusion_graph"] if graph.extras and \
            "diffusion_graph" in graph.extras else g
        h_a = self.enc_a(g, x, training)
        h_d = self.enc_d(diff, x, training)
        hn_a = self.enc_a(g, x_corrupt, training)
        hn_d = self.enc_d(diff, x_corrupt, training)
        mask = graph.node_mask().astype(h_a.dtype)[:, None]
        s_a = jax.nn.sigmoid((h_a * mask).sum(0) / jnp.maximum(mask.sum(), 1.0))
        s_d = jax.nn.sigmoid((h_d * mask).sum(0) / jnp.maximum(mask.sum(), 1.0))
        # cross-view scores
        pos = h_a @ self.disc(s_d) + h_d @ self.disc(s_a)
        neg = hn_a @ self.disc(s_d) + hn_d @ self.disc(s_a)
        return pos, neg

    def embed(self, graph: Graph, x: Optional[jnp.ndarray] = None):
        if x is None:
            x = graph.x
        return self(graph, x, False)
