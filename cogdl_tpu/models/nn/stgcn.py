"""STGCN — spatio-temporal GCN for traffic prediction
(reference cogdl/models/nn/stgcn.py, layers STConvLayer). Input is a window
tensor [B, T, N, C]; temporal gated convs sandwich a spectral graph conv."""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...data.graph import Graph, sym_norm
from ...ops import spmm


class TemporalGatedConv(nn.Module):
    channels: int
    kt: int = 3

    @nn.compact
    def __call__(self, x: jnp.ndarray):
        # x: [B, T, N, C] → causal conv over T with GLU gating
        pq = nn.Conv(2 * self.channels, kernel_size=(self.kt, 1),
                     padding="VALID", name="conv")(x)
        p, q = jnp.split(pq, 2, axis=-1)
        return p * jax.nn.sigmoid(q)


class STConvBlock(nn.Module):
    spatial_channels: int
    out_channels: int
    kt: int = 3

    @nn.compact
    def __call__(self, graph: Graph, x: jnp.ndarray, training: bool = False):
        x = TemporalGatedConv(self.out_channels, self.kt, name="t1")(x)
        # spatial graph conv on every (batch, time) slice
        B, T, N, C = x.shape
        h = nn.Dense(self.spatial_channels, use_bias=False, name="theta")(x)
        h2 = h.reshape(B * T, N, self.spatial_channels)
        h2 = jax.vmap(lambda f: spmm(graph, f))(h2)
        x = nn.relu(h2.reshape(B, T, N, self.spatial_channels))
        x = TemporalGatedConv(self.out_channels, self.kt, name="t2")(x)
        return nn.LayerNorm(name="ln")(x)


class STGCN(nn.Module):
    in_features: int            # input channels per node per step
    out_features: int = 1       # predicted channels
    hidden_size: int = 64
    spatial_channels: int = 16
    num_blocks: int = 2
    kt: int = 3
    window: int = 12

    @nn.compact
    def __call__(self, graph: Graph, x: Optional[jnp.ndarray] = None,
                 training: bool = False):
        """x: [B, T, N, C_in] window tensor (graph.extras['window'] if None)."""
        if x is None:
            x = graph.extras["window"]
        g = sym_norm(graph)
        for i in range(self.num_blocks):
            x = STConvBlock(self.spatial_channels, self.hidden_size,
                            self.kt, name=f"block{i}")(g, x, training)
        # final temporal collapse + output head
        T_left = x.shape[1]
        x = nn.Conv(self.hidden_size, kernel_size=(T_left, 1),
                    padding="VALID", name="out_t")(x)
        x = nn.relu(x)
        return nn.Dense(self.out_features, name="out")(x).squeeze(1)
