"""Graph-agnostic MLP baseline — rebuild of reference cogdl/models/nn/mlp.py."""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from ...layers import MLP


class MLPModel(nn.Module):
    in_features: int
    out_features: int
    hidden_size: int = 64
    num_layers: int = 2
    dropout: float = 0.5
    norm: Optional[str] = None

    @nn.compact
    def __call__(self, graph, x: Optional[jnp.ndarray] = None,
                 training: bool = False):
        if x is None:
            x = graph.x
        return MLP(self.out_features, hidden_features=self.hidden_size,
                   num_layers=self.num_layers, dropout=self.dropout,
                   norm=self.norm, name="mlp")(x, training)
