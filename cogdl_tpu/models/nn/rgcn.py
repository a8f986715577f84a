"""R-GCN for entity classification / KG link prediction
(reference cogdl/models/nn/rgcn.py)."""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from ...data.graph import Graph
from ...layers import RGCNLayer


class RGCN(nn.Module):
    in_features: int
    out_features: int
    num_relations: int = 4
    hidden_size: int = 64
    num_layers: int = 2
    num_bases: int = 4
    dropout: float = 0.0
    self_loop: bool = True

    @nn.compact
    def __call__(self, graph: Graph, x: Optional[jnp.ndarray] = None,
                 training: bool = False):
        if x is None:
            x = graph.x
        for i in range(self.num_layers - 1):
            x = RGCNLayer(self.hidden_size, self.num_relations,
                          num_bases=self.num_bases, self_loop=self.self_loop,
                          dropout=self.dropout, name=f"layer{i}")(graph, x,
                                                                  training)
            x = nn.relu(x)
        return RGCNLayer(self.out_features, self.num_relations,
                         num_bases=self.num_bases, self_loop=self.self_loop,
                         name=f"layer{self.num_layers-1}")(graph, x, training)
