"""Plain MLP block (reference cogdl/layers/mlp_layer.py)."""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from .utils import get_activation


class MLP(nn.Module):
    out_features: int
    hidden_features: int = 64
    num_layers: int = 2
    dropout: float = 0.0
    activation: str = "relu"
    norm: Optional[str] = None
    act_first: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, training: bool = False):
        act = get_activation(self.activation)
        for i in range(self.num_layers - 1):
            x = nn.Dense(self.hidden_features, name=f"fc{i}")(x)
            if self.act_first:
                x = act(x)
            if self.norm == "batchnorm":
                x = nn.BatchNorm(use_running_average=not training, name=f"norm{i}")(x)
            elif self.norm == "layernorm":
                x = nn.LayerNorm(name=f"norm{i}")(x)
            if not self.act_first:
                x = act(x)
            if self.dropout > 0 and training:
                x = nn.Dropout(rate=self.dropout, deterministic=False)(x)
        return nn.Dense(self.out_features, name=f"fc{self.num_layers - 1}")(x)
