"""DeeperGCN — GENConv + pre-activation residual stack with optional
jax.checkpoint rematerialisation (the TPU analog of the reference's
memory-saving deep stacks; reference cogdl/models/nn/deepergcn.py)."""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...data.graph import Graph
from ...layers import GENConv, ResGNNLayer


class DeeperGCN(nn.Module):
    in_features: int
    out_features: int
    hidden_size: int = 64
    num_layers: int = 14
    aggr: str = "softmax_sg"
    dropout: float = 0.2
    remat: bool = False

    @nn.compact
    def __call__(self, graph: Graph, x: Optional[jnp.ndarray] = None,
                 training: bool = False):
        if x is None:
            x = graph.x
        h = nn.Dense(self.hidden_size, name="fc_in")(x)
        block = ResGNNLayer
        norm = "batchnorm"
        if self.remat:
            block = nn.remat(ResGNNLayer, static_argnums=(3,))
            norm = "layernorm"   # batch_stats can't mutate under remat
        for i in range(self.num_layers):
            h = block(self.hidden_size, aggr=self.aggr, dropout=self.dropout,
                      norm=norm, name=f"block{i}")(graph, h, training)
        h = nn.relu(h)
        if self.dropout > 0 and training:
            h = nn.Dropout(rate=self.dropout, deterministic=False)(h)
        return nn.Dense(self.out_features, name="fc_out")(h)
