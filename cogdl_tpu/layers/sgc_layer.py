"""SGC layer: K-step propagation then a single linear map
(reference cogdl/layers/sgc_layer.py)."""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from ..data.graph import Graph
from ..ops import spmm


class SGCLayer(nn.Module):
    out_features: int
    order: int = 2

    @nn.compact
    def __call__(self, graph: Graph, x: jnp.ndarray, training: bool = False):
        for _ in range(self.order):
            x = spmm(graph, x)
        return nn.Dense(self.out_features, name="W")(x)
