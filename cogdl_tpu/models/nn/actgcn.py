"""ActGCN — activation-compressed GCN.

The reference's ``actgcn`` (cogdl/models/nn/actgcn.py) swaps every layer for
an ActNN 2-bit-quantised twin (third_party/actnn CUDA). The TPU-idiomatic
equivalent of activation compression is bf16 activations with f32 parameters
plus rematerialisation of the layer forward in the backward pass — the same
memory knee (store ~half the bytes, recompute instead of load) using hardware
the MXU natively supports instead of custom quantisation kernels.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...data.graph import Graph
from .gcn import GCN


class ActGCN(nn.Module):
    in_features: int
    out_features: int
    hidden_size: int = 64
    num_layers: int = 2
    dropout: float = 0.5
    activation: str = "relu"
    norm: Optional[str] = None
    residual: bool = False

    @nn.compact
    def __call__(self, graph: Graph, x: Optional[jnp.ndarray] = None,
                 training: bool = False):
        if x is None:
            x = graph.x
        inner = GCN(self.in_features, self.out_features, self.hidden_size,
                    self.num_layers, self.dropout, self.activation,
                    self.norm, self.residual, name="gcn")
        apply = nn.remat(type(inner).__call__, static_argnums=(3,))
        logits = apply(inner, graph, x.astype(jnp.bfloat16), training)
        return logits.astype(jnp.float32)
