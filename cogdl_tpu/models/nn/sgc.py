"""SGC — rebuild of reference cogdl/models/nn/sgc.py."""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from ...data.graph import Graph, sym_norm
from ...layers import SGCLayer


class SGC(nn.Module):
    in_features: int
    out_features: int
    order: int = 2

    @nn.compact
    def __call__(self, graph: Graph, x: Optional[jnp.ndarray] = None,
                 training: bool = False):
        if x is None:
            x = graph.x
        graph = sym_norm(graph)
        return SGCLayer(self.out_features, order=self.order, name="sgc")(
            graph, x, training)
