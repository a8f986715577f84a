"""GIN layer: (1+eps)·x + Σ_neighbors, followed by an MLP.

Rebuild of reference ``GINLayer`` (cogdl/layers/gin_layer.py)."""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from ..data.graph import Graph
from ..ops import aggregate
from .mlp import MLP


class GINLayer(nn.Module):
    out_features: int
    hidden_features: int = 0     # 0 → same as out
    eps: float = 0.0
    train_eps: bool = True
    batchnorm: bool = True

    @nn.compact
    def __call__(self, graph: Graph, x: jnp.ndarray, training: bool = False):
        if self.train_eps:
            eps = self.param("eps", nn.initializers.constant(self.eps), ())
        else:
            eps = self.eps
        agg = aggregate(graph, x, "sum")
        h = (1.0 + eps) * x + agg
        hidden = self.hidden_features or self.out_features
        h = nn.Dense(hidden, name="fc1")(h)
        if self.batchnorm:
            from .utils import MaskedBatchNorm

            h = MaskedBatchNorm(name="bn")(
                h, graph.node_mask(), use_running_average=not training)
        h = nn.relu(h)
        return nn.Dense(self.out_features, name="fc2")(h)
