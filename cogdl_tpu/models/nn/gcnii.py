"""GCNII — rebuild of reference cogdl/models/nn/gcnii.py."""

from __future__ import annotations

import math
from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from ...data.graph import Graph, sym_norm
from ...layers import GCNIILayer


class GCNII(nn.Module):
    in_features: int
    out_features: int
    hidden_size: int = 64
    num_layers: int = 16
    dropout: float = 0.5
    alpha: float = 0.1
    lmbda: float = 0.5
    wd1: float = 0.0  # kept for config parity; weight decay handled by optax

    @nn.compact
    def __call__(self, graph: Graph, x: Optional[jnp.ndarray] = None,
                 training: bool = False):
        if x is None:
            x = graph.x
        graph = sym_norm(graph)
        if self.dropout > 0 and training:
            x = nn.Dropout(rate=self.dropout, deterministic=False)(x)
        h = nn.relu(nn.Dense(self.hidden_size, name="fc_in")(x))
        h0 = h
        for i in range(self.num_layers):
            if self.dropout > 0 and training:
                h = nn.Dropout(rate=self.dropout, deterministic=False)(h)
            beta = math.log(self.lmbda / (i + 1) + 1)
            h = GCNIILayer(self.hidden_size, alpha=self.alpha, beta=beta,
                           name=f"layer{i}")(graph, h, h0, training)
            h = nn.relu(h)
        if self.dropout > 0 and training:
            h = nn.Dropout(rate=self.dropout, deterministic=False)(h)
        return nn.Dense(self.out_features, name="fc_out")(h)
