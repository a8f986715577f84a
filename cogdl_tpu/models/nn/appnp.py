"""APPNP / PPNP — rebuild of reference cogdl/models/nn/ppnp.py.

MLP predictor + personalised-PageRank propagation (APPNPProp scan)."""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from ...data.graph import Graph, sym_norm
from ...layers import APPNPProp, MLP


class APPNP(nn.Module):
    in_features: int
    out_features: int
    hidden_size: int = 64
    num_layers: int = 2
    dropout: float = 0.5
    propagation_steps: int = 10
    alpha: float = 0.1

    @nn.compact
    def __call__(self, graph: Graph, x: Optional[jnp.ndarray] = None,
                 training: bool = False):
        if x is None:
            x = graph.x
        graph = sym_norm(graph)
        if self.dropout > 0 and training:
            x = nn.Dropout(rate=self.dropout, deterministic=False)(x)
        h = MLP(self.out_features, hidden_features=self.hidden_size,
                num_layers=self.num_layers, dropout=self.dropout,
                name="predictor")(x, training)
        return APPNPProp(k=self.propagation_steps, alpha=self.alpha,
                         name="prop")(graph, h, training)
