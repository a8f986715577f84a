"""GAE / VGAE: (variational) graph auto-encoders.

Rebuild of reference cogdl/models/nn/gae.py — GCN encoder, inner-product
decoder, BCE reconstruction (+ KL for VGAE).
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...data.graph import Graph, sym_norm
from ...layers import GCNLayer


class GAE(nn.Module):
    in_features: int
    out_features: int = 0    # unused
    hidden_size: int = 32
    emb_size: int = 16

    def setup(self):
        self.conv1 = GCNLayer(self.hidden_size, activation="relu", name="conv1")
        self.conv2 = GCNLayer(self.emb_size, name="conv2")

    def encode(self, graph: Graph, x: jnp.ndarray, training: bool = False):
        g = sym_norm(graph)
        return self.conv2(g, self.conv1(g, x, training), training)

    def __call__(self, graph: Graph, x: Optional[jnp.ndarray] = None,
                 training: bool = False):
        if x is None:
            x = graph.x
        return self.encode(graph, x, training)

    def decode_edges(self, z: jnp.ndarray, rows: jnp.ndarray, cols: jnp.ndarray):
        """Inner-product decoder logits for given (row, col) pairs."""
        return jnp.sum(z[rows] * z[cols], axis=-1)

    def embed(self, graph: Graph, x: Optional[jnp.ndarray] = None):
        if x is None:
            x = graph.x
        return self.encode(graph, x, False)


class VGAE(GAE):
    has_kl = True

    def setup(self):
        self.conv1 = GCNLayer(self.hidden_size, activation="relu", name="conv1")
        self.conv_mu = GCNLayer(self.emb_size, name="conv_mu")
        self.conv_logstd = GCNLayer(self.emb_size, name="conv_logstd")

    def encode_dist(self, graph: Graph, x: jnp.ndarray, training: bool = False):
        g = sym_norm(graph)
        h = self.conv1(g, x, training)
        return self.conv_mu(g, h, training), self.conv_logstd(g, h, training)

    def encode(self, graph: Graph, x: jnp.ndarray, training: bool = False):
        mu, logstd = self.encode_dist(graph, x, training)
        if training:
            eps = jax.random.normal(self.make_rng("dropout"), mu.shape)
            return mu + eps * jnp.exp(jnp.clip(logstd, -10, 10))
        return mu

    def kl(self, graph: Graph, x: jnp.ndarray):
        mu, logstd = self.encode_dist(graph, x, False)
        logstd = jnp.clip(logstd, -10, 10)
        m = graph.node_mask().astype(mu.dtype)[:, None]
        kl = -0.5 * jnp.sum(
            (1 + 2 * logstd - mu ** 2 - jnp.exp(2 * logstd)) * m)
        return kl / jnp.maximum(m.sum(), 1.0)
