"""RevGCN — reversible GCN for O(1)-activation deep training.

Rebuild of reference cogdl/models/nn/revgcn.py + layers/reversible_layer.py
(509 LoC of custom autograd). TPU-first: instead of hand-written backward
recomputation (InvertibleCheckpoint), we express the same additive coupling
      x1', x2' = x1 + F(x2), x2 + G(x1')
and let ``jax.checkpoint`` (remat) provide the memory/compute trade — XLA
recomputes the forward inside the backward pass, which is the identical
FLOP/memory profile without 500 lines of autograd machinery.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...data.graph import Graph, sym_norm
from ...layers import GCNLayer


class RevBlock(nn.Module):
    features: int
    dropout: float = 0.0

    @nn.compact
    def __call__(self, graph: Graph, x1: jnp.ndarray, x2: jnp.ndarray,
                 training: bool = False):
        f = GCNLayer(self.features, activation="relu", dropout=self.dropout,
                     name="F")
        g = GCNLayer(self.features, activation="relu", dropout=self.dropout,
                     name="G")
        y1 = x1 + f(graph, x2, training)
        y2 = x2 + g(graph, y1, training)
        return y1, y2


class RevGCN(nn.Module):
    in_features: int
    out_features: int
    hidden_size: int = 64
    num_layers: int = 8
    dropout: float = 0.1
    group: int = 2

    @nn.compact
    def __call__(self, graph: Graph, x: Optional[jnp.ndarray] = None,
                 training: bool = False):
        if x is None:
            x = graph.x
        g = sym_norm(graph)
        h = nn.Dense(self.hidden_size * 2, name="fc_in")(x)
        x1, x2 = jnp.split(h, 2, axis=-1)
        Block = nn.remat(RevBlock, static_argnums=(4,))
        for i in range(self.num_layers):
            x1, x2 = Block(self.hidden_size, dropout=self.dropout,
                           name=f"block{i}")(g, x1, x2, training)
        h = jnp.concatenate([x1, x2], axis=-1)
        h = nn.relu(h)
        return nn.Dense(self.out_features, name="fc_out")(h)
