"""GNNGuard-defended GCN (reference examples/GRB/defense/gnnguard.py:43
``GCNGuard``): before every propagation the adjacency is re-weighted by
pruned cosine similarity of the CURRENT layer features
(``utils.grb.gnnguard_reweight``), neutralising adversarially injected
edges whose endpoints disagree. Static shapes — pruning zeroes weights in
place."""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from ...data.graph import Graph
from ...layers import GCNLayer
from ...utils.grb import gnnguard_reweight


class GNNGuardGCN(nn.Module):
    in_features: int
    out_features: int
    hidden_size: int = 64
    num_layers: int = 2
    dropout: float = 0.5
    threshold: float = 0.1
    attention: bool = True

    @nn.compact
    def __call__(self, graph: Graph, x: Optional[jnp.ndarray] = None,
                 training: bool = False):
        if x is None:
            x = graph.x
        for i in range(self.num_layers):
            g = gnnguard_reweight(graph, x, self.threshold) \
                if self.attention else graph
            last = i == self.num_layers - 1
            x = GCNLayer(
                self.out_features if last else self.hidden_size,
                dropout=0.0 if last else self.dropout,
                activation=None if last else "relu",
                name=f"layer{i}")(g, x, training)
        return x
