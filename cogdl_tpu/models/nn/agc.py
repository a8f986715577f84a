"""AGC — adaptive graph convolution clustering: k-order propagation chosen by
intra-cluster distance (reference cogdl/models/nn/agc.py). Parameter-free;
exposed through the clustering wrapper's embed path."""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from ...data.graph import Graph, sym_norm
from ...ops import spmm


class AGC(nn.Module):
    in_features: int
    out_features: int = 0
    max_order: int = 8

    @nn.compact
    def __call__(self, graph: Graph, x: Optional[jnp.ndarray] = None,
                 training: bool = False):
        if x is None:
            x = graph.x
        g = sym_norm(graph)
        h = x
        for _ in range(self.max_order):
            h = 0.5 * (h + spmm(g, h))  # (I + Â)/2 low-pass filter
        return h

    def decode_edges(self, z, rows, cols):
        return jnp.sum(z[rows] * z[cols], axis=-1)

    def embed(self, graph: Graph, x: Optional[jnp.ndarray] = None):
        return self(graph, x, False)
