"""DisenGCN — disentangled representation via neighborhood routing
(reference cogdl/models/nn/disengcn.py + layers/disengcn_layer.py).
K channels per node; routing iterations reassign neighbor mass per channel."""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...data.graph import Graph
from ...ops import segment as seg


class DisenLayer(nn.Module):
    channels: int = 4
    channel_dim: int = 16
    routing_iters: int = 3

    @nn.compact
    def __call__(self, graph: Graph, x: jnp.ndarray, training: bool = False):
        K, D = self.channels, self.channel_dim
        z = nn.Dense(K * D, name="proj")(x).reshape(-1, K, D)
        # rsqrt(x+eps) keeps grads finite on zero rows (linalg.norm vjp NaNs)
        z = z * jax.lax.rsqrt(jnp.sum(z ** 2, -1, keepdims=True) + 1e-12)
        src = seg.gather(z, graph.col)                 # [E, K, D]
        dst = z
        c = z                                          # routing target [N,K,D]
        for _ in range(self.routing_iters):
            # attention of each edge to each channel
            logits = jnp.sum(src * seg.gather(c, graph.row), -1)  # [E, K]
            att = jax.nn.softmax(logits, axis=-1)
            att = att * graph.edge_mask()[:, None]
            agg = seg.segment_sum(src * att[..., None], graph.row, graph.n_pad)
            c = dst + agg
            c = c * jax.lax.rsqrt(jnp.sum(c ** 2, -1, keepdims=True) + 1e-12)
        return c.reshape(-1, K * D)


class DisenGCN(nn.Module):
    in_features: int
    out_features: int
    channels: int = 4
    channel_dim: int = 16
    num_layers: int = 2
    routing_iters: int = 3
    dropout: float = 0.35

    @nn.compact
    def __call__(self, graph: Graph, x: Optional[jnp.ndarray] = None,
                 training: bool = False):
        if x is None:
            x = graph.x
        for i in range(self.num_layers):
            x = DisenLayer(self.channels, self.channel_dim,
                           self.routing_iters, name=f"layer{i}")(graph, x,
                                                                 training)
            if self.dropout > 0 and training:
                x = nn.Dropout(rate=self.dropout, deterministic=False)(x)
        return nn.Dense(self.out_features, name="out")(x)
