"""MixHop layer: concatenation of multi-power adjacency propagations
(reference cogdl/layers/mixhop_layer.py)."""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from ..data.graph import Graph
from ..ops import spmm


class MixHopLayer(nn.Module):
    out_features: int           # per-power width
    powers: Sequence[int] = (0, 1, 2)

    @nn.compact
    def __call__(self, graph: Graph, x: jnp.ndarray, training: bool = False):
        outs = []
        h = x
        max_p = max(self.powers)
        per_power = {0: h}
        for p in range(1, max_p + 1):
            h = spmm(graph, h)
            per_power[p] = h
        for p in self.powers:
            outs.append(nn.Dense(self.out_features, name=f"W{p}")(per_power[p]))
        return jnp.concatenate(outs, axis=-1)
