"""ActGCN — activation-compressed GCN.

The reference's ``actgcn`` (cogdl/models/nn/actgcn.py) swaps every layer for
an ActNN-quantised twin (third_party/actnn CUDA: store low-bit activations,
dequantise in backward). The TPU-native equivalent lives in
``ops/actnn.py``: the dense transform stores its input as **int8 with
per-row scales** (``act_dense``), relu stores a bool mask (``act_relu``),
and SpMM stores nothing (linear in x — the backward is the transpose SpMM).
Per layer the activation residual is one int8 copy + one predicate mask —
ActNN's memory profile, MXU-native math. bf16 compute can stack on top via
the Trainer's ``bf16`` flag."""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from ...data.graph import Graph, sym_norm
from ...ops import spmm
from ...ops.actnn import act_dense, act_relu


class ActGCN(nn.Module):
    in_features: int
    out_features: int
    hidden_size: int = 64
    num_layers: int = 2
    dropout: float = 0.5
    activation: str = "relu"      # compressed path is relu-only
    norm: Optional[str] = None
    residual: bool = False

    @nn.compact
    def __call__(self, graph: Graph, x: Optional[jnp.ndarray] = None,
                 training: bool = False):
        if x is None:
            x = graph.x
        graph = sym_norm(graph)
        if self.dropout > 0 and training:
            x = nn.Dropout(self.dropout, deterministic=False)(x)
        dims = [self.hidden_size] * (self.num_layers - 1) + [self.out_features]
        for i, d in enumerate(dims):
            w = self.param(f"w{i}", nn.initializers.glorot_uniform(),
                           (x.shape[-1], d))
            b = self.param(f"b{i}", nn.initializers.zeros, (d,))
            h = act_dense(x, w, b)
            x = spmm(graph, h)
            if i < len(dims) - 1:
                x = act_relu(x)
                if self.dropout > 0 and training:
                    x = nn.Dropout(self.dropout, deterministic=False)(x)
        return x
