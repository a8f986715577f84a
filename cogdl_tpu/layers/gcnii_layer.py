"""GCNII layer: initial-residual + identity-mapping GCN.

Rebuild of reference ``GCNIILayer`` (cogdl/layers/gcnii_layer.py):
h = ((1-α)·Â h + α·h0); out = ((1-β)·I + β·W) h.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from ..data.graph import Graph
from ..ops import spmm
from .utils import CDense


class GCNIILayer(nn.Module):
    features: int
    alpha: float = 0.1
    beta: float = 1.0
    residual: bool = False

    @nn.compact
    def __call__(self, graph: Graph, x: jnp.ndarray, h0: jnp.ndarray,
                 training: bool = False):
        agg = spmm(graph, x)
        support = (1 - self.alpha) * agg + self.alpha * h0
        out = (1 - self.beta) * support + self.beta * CDense(
            self.features, use_bias=False, name="W")(support)
        if self.residual:
            out = out + x
        return out
