"""STGAT — spatio-temporal GAT for traffic prediction
(reference cogdl/models/nn/stgat.py): GAT spatial attention inside the
temporal conv sandwich. The (batch·time) axis is vmapped over a single
shared-parameter GAT — one compiled attention program for all slices."""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from ...data.graph import Graph
from ...layers import GATLayer
from .stgcn import TemporalGatedConv


class STGAT(nn.Module):
    in_features: int
    out_features: int = 1
    hidden_size: int = 32
    nhead: int = 4
    num_blocks: int = 1
    kt: int = 3
    window: int = 12

    @nn.compact
    def __call__(self, graph: Graph, x: Optional[jnp.ndarray] = None,
                 training: bool = False):
        if x is None:
            x = graph.extras["window"]
        VGat = nn.vmap(
            GATLayer,
            in_axes=(None, 0, None), out_axes=0,
            variable_axes={"params": None},
            split_rngs={"params": False, "dropout": False},
        )
        for i in range(self.num_blocks):
            x = TemporalGatedConv(self.hidden_size, self.kt, name=f"t1_{i}")(x)
            B, T, N, C = x.shape
            flat = x.reshape(B * T, N, C)
            out = VGat(self.hidden_size // self.nhead, nhead=self.nhead,
                       attn_drop=0.0, concat=True,
                       name=f"gat{i}")(graph, flat, training)
            x = nn.relu(out).reshape(B, T, N, -1)
            x = TemporalGatedConv(self.hidden_size, self.kt, name=f"t2_{i}")(x)
            x = nn.LayerNorm(name=f"ln{i}")(x)
        T_left = x.shape[1]
        x = nn.Conv(self.hidden_size, kernel_size=(T_left, 1),
                    padding="VALID", name="out_t")(x)
        x = nn.relu(x)
        return nn.Dense(self.out_features, name="out")(x).squeeze(1)
