"""Squeeze-and-excitation over node features (reference cogdl/layers/se_layer.py)."""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp


class SELayer(nn.Module):
    se_channels: int = 16

    @nn.compact
    def __call__(self, x: jnp.ndarray, training: bool = False):
        z = x.mean(axis=0, keepdims=True)
        s = nn.Dense(self.se_channels, name="fc1")(z)
        s = nn.relu(s)
        s = nn.Dense(x.shape[-1], name="fc2")(s)
        return x * nn.sigmoid(s)
