"""SAINT high-order aggregator layer (reference cogdl/layers/saint_layer.py
``SAINTLayer``/HighOrderAggregator from the GraphSAINT paper).

One layer computes k-hop propagations ``[x, Ax, A²x, …, A^order·x]``, gives
each order its own dense transform, and combines them by concatenation (the
paper's default) or mean. ``bias="norm"`` applies the paper's per-order
feature normalisation (LayerNorm here — jit-pure, same role as the
reference's BatchNorm1d variant)."""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from ..data.graph import Graph
from ..ops import spmm
from .utils import get_activation


class SAINTLayer(nn.Module):
    out_features: int
    order: int = 1               # hops aggregated in this layer (0 = MLP)
    aggr: str = "concat"         # concat | mean
    act: str = "relu"
    bias: str = "norm"           # norm | bias
    dropout: float = 0.1

    @nn.compact
    def __call__(self, graph: Graph, x: jnp.ndarray, training: bool = False):
        feats = [x]
        h = x
        for _ in range(self.order):
            h = spmm(graph, h)
            feats.append(h)
        act = get_activation(self.act)
        outs = []
        for o, f in enumerate(feats):
            if self.dropout > 0 and training:
                f = nn.Dropout(self.dropout, deterministic=False)(f)
            z = act(nn.Dense(self.out_features, name=f"order{o}")(f))
            if self.bias == "norm":
                z = nn.LayerNorm(name=f"norm{o}")(z)
            outs.append(z)
        if self.aggr == "concat":
            return jnp.concatenate(outs, axis=-1)
        return sum(outs) / len(outs)
