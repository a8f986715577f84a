"""LightGCN — embedding propagation for recommendation
(reference cogdl/models/nn/lightgcn.py): no transforms, mean of K-hop
propagated user/item embeddings, BPR training handled by the rec wrapper."""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from ...data.graph import Graph, sym_norm
from ...ops import spmm


class LightGCN(nn.Module):
    in_features: int = 0        # unused; embeddings learned
    out_features: int = 0
    num_nodes: int = 0          # users + items (padded size from graph)
    hidden_size: int = 64
    num_layers: int = 3

    @nn.compact
    def __call__(self, graph: Graph, x: Optional[jnp.ndarray] = None,
                 training: bool = False):
        emb = self.param("emb", nn.initializers.normal(0.1),
                         (graph.n_pad, self.hidden_size))
        g = sym_norm(graph)
        acc = emb
        h = emb
        for _ in range(self.num_layers):
            h = spmm(g, h)
            acc = acc + h
        return acc / (self.num_layers + 1)
