"""APPNP propagation: personalised-PageRank smoothing of predictions,
h^{k+1} = (1-α)·Â h^k + α·h^0 — implemented with lax.scan so K steps compile
to one fused loop (reference cogdl/models/nn/ppnp.py propagation)."""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..data.graph import Graph
from ..ops import spmm


class APPNPProp(nn.Module):
    k: int = 10
    alpha: float = 0.1

    @nn.compact
    def __call__(self, graph: Graph, h: jnp.ndarray, training: bool = False):
        h0 = h

        def step(carry, _):
            nh = (1 - self.alpha) * spmm(graph, carry) + self.alpha * h0
            return nh, None

        out, _ = jax.lax.scan(step, h, None, length=self.k)
        return out
