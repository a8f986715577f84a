"""GraphMAE — masked feature autoencoding on graphs
(reference examples/graphmae; BASELINE.json config 5). GAT/GCN encoder,
masked-node reconstruction with scaled cosine error."""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...data.graph import Graph, sym_norm
from ...layers import GCNLayer


class GraphMAE(nn.Module):
    in_features: int
    out_features: int = 0
    hidden_size: int = 256
    num_layers: int = 2
    mask_rate: float = 0.5
    gamma: float = 2.0          # scaled-cosine sharpening

    def setup(self):
        self.encoder = [GCNLayer(self.hidden_size, activation="prelu",
                                 name=f"enc{i}")
                        for i in range(self.num_layers)]
        self.decoder = GCNLayer(self.in_features, name="dec")
        self.mask_token = self.param("mask_token", nn.initializers.zeros,
                                     (1, self.in_features))
        self.enc2dec = nn.Dense(self.hidden_size, use_bias=False,
                                name="enc2dec")

    def encode(self, graph: Graph, x, training: bool = False):
        g = sym_norm(graph)
        h = x
        for layer in self.encoder:
            h = layer(g, h, training)
        return h

    def __call__(self, graph: Graph, x: Optional[jnp.ndarray] = None,
                 training: bool = False):
        if x is None:
            x = graph.x
        return self.encode(graph, x, training)

    def reconstruction_loss(self, graph: Graph, x, rng, training: bool = True):
        g = sym_norm(graph)
        mask = jax.random.bernoulli(rng, self.mask_rate, (x.shape[0], 1))
        mask = mask & graph.node_mask()[:, None]
        x_masked = jnp.where(mask, self.mask_token, x)
        h = x_masked
        for layer in self.encoder:
            h = layer(g, h, training)
        h = self.enc2dec(h)
        # re-mask before decoding
        h = jnp.where(mask, 0.0, h)
        rec = self.decoder(g, h, training)
        # scaled cosine error on masked nodes
        def norm(v):
            return v * jax.lax.rsqrt(jnp.sum(v ** 2, -1, keepdims=True) + 1e-12)
        cos = jnp.sum(norm(rec) * norm(x), -1)
        per = (1 - cos) ** self.gamma
        m = mask.squeeze(-1).astype(per.dtype)
        return jnp.sum(per * m) / jnp.maximum(m.sum(), 1.0)

    def embed(self, graph: Graph, x: Optional[jnp.ndarray] = None):
        if x is None:
            x = graph.x
        return self.encode(graph, x, False)
