"""SRGCN — structured relational attention GCN
(reference cogdl/models/nn/srgcn.py + utils/srgcn_utils.py): attention-typed
adjacency (node-feature attention) + k-hop propagation."""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...data.graph import Graph
from ...ops import edge_softmax, gather, spmm_coo


class SRGCN(nn.Module):
    in_features: int
    out_features: int
    hidden_size: int = 64
    num_hops: int = 2
    dropout: float = 0.5

    @nn.compact
    def __call__(self, graph: Graph, x: Optional[jnp.ndarray] = None,
                 training: bool = False):
        if x is None:
            x = graph.x
        h = nn.Dense(self.hidden_size, name="proj")(x)
        # node-pair attention weights on existing edges
        a_dst = self.param("a_dst", nn.initializers.glorot_uniform(),
                           (self.hidden_size, 1))
        a_src = self.param("a_src", nn.initializers.glorot_uniform(),
                           (self.hidden_size, 1))
        e = (gather((h @ a_dst).squeeze(-1), graph.row)
             + gather((h @ a_src).squeeze(-1), graph.col))
        att = edge_softmax(graph, jax.nn.leaky_relu(e, 0.2))
        z = h
        for _ in range(self.num_hops):
            z = spmm_coo(z, graph.row, graph.col, att, graph.n_pad)
        if self.dropout > 0 and training:
            z = nn.Dropout(rate=self.dropout, deterministic=False)(z)
        return nn.Dense(self.out_features, name="out")(z)
