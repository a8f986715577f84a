"""GraphSAGE layer with mean/sum/max/gcn aggregators.

Rebuild of reference ``SAGELayer`` (cogdl/layers/sage_layer.py); the max
aggregator uses segment_max (reference scatter_max CUDA op)."""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..data.graph import Graph
from ..ops import aggregate
from .utils import CDense, get_activation


class SAGELayer(nn.Module):
    out_features: int
    aggr: str = "mean"  # mean | sum | max | gcn
    normalize: bool = False
    dropout: float = 0.0
    activation: Optional[str] = None

    @nn.compact
    def __call__(self, graph: Graph, x: jnp.ndarray, training: bool = False):
        if self.aggr == "gcn":
            out = CDense(self.out_features, name="W")(aggregate(graph, x, "sum") + x)
        else:
            nbr = aggregate(graph, x, self.aggr)
            out = CDense(self.out_features, name="W_self")(x) + CDense(
                self.out_features, name="W_nbr")(nbr)
        if self.normalize:
            out = out * jax.lax.rsqrt(jnp.sum(out ** 2, -1, keepdims=True) + 1e-12)
        if self.activation is not None:
            out = get_activation(self.activation)(out)
        if self.dropout > 0 and training:
            out = nn.Dropout(rate=self.dropout, deterministic=False)(out)
        return out
