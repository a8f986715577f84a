"""GCN layer: linear → SpMM → bias/norm/act/residual/dropout.

TPU-native rebuild of reference ``GCNLayer`` (cogdl/layers/gcn_layer.py:9-64).
The dense transform runs on the MXU in bf16-friendly shapes; aggregation uses
the SpMM dispatch (Pallas BCSR on TPU, segment-sum fallback elsewhere).
"""

from __future__ import annotations

from typing import Callable, Optional

import flax.linen as nn
import jax.numpy as jnp

from ..data.graph import Graph
from ..ops import spmm
from .utils import CDense, get_activation


class GCNLayer(nn.Module):
    out_features: int
    dropout: float = 0.0
    activation: Optional[str] = None
    residual: bool = False
    norm: Optional[str] = None  # "batchnorm" | "layernorm" | None
    bias: bool = True

    @nn.compact
    def __call__(self, graph: Graph, x: jnp.ndarray, training: bool = False,
                 prop=None):
        dense = CDense(self.out_features, use_bias=self.bias, name="linear")
        if prop is not None:
            # cached-propagation path (ops.spmm.cache_propagation): the layer
            # input is the static graph.x, so Â(XW + 1bᵀ) = (ÂX)W + (Â1)bᵀ.
            # dense(0) recovers the bias b, keeping the param structure (and
            # its initialisation) byte-identical to the uncached layer.
            p, s = prop
            out = dense(p.astype(x.dtype))
            if self.bias:
                b = dense(jnp.zeros((1, p.shape[-1]), x.dtype))
                out = out + (s.astype(x.dtype) - 1.0) * b
        else:
            h = dense(x)
            # aggregate after the dense transform (shrinks the SpMM feature
            # width when out_features < in); XLA fuses the rest.
            out = spmm(graph, h)
        if self.norm == "batchnorm":
            from .utils import MaskedBatchNorm

            out = MaskedBatchNorm(name="norm")(
                out, graph.node_mask(), use_running_average=not training)
        elif self.norm == "layernorm":
            out = nn.LayerNorm(name="norm")(out)
        if self.residual:
            res = x if x.shape[-1] == self.out_features else nn.Dense(
                self.out_features, use_bias=False, name="res_proj")(x)
            out = out + res
        if self.activation is not None:
            out = get_activation(self.activation)(out)
        if self.dropout > 0 and training:
            out = nn.Dropout(rate=self.dropout, deterministic=False)(out)
        return out
