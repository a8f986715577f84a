"""DropEdge GCN — edge dropout as a static-shape weight mask.

Rebuild of reference cogdl/models/nn/dropedge_gcn.py (660 LoC of backbone
variants collapse into one parametric stack: TPU-first drop = zeroing edge
weights, never changing shapes)."""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...data.graph import Graph, sym_norm
from ...layers import GCNLayer


class DropEdgeGCN(nn.Module):
    in_features: int
    out_features: int
    hidden_size: int = 64
    num_layers: int = 4
    dropout: float = 0.5
    dropedge_rate: float = 0.2
    norm: Optional[str] = None

    @nn.compact
    def __call__(self, graph: Graph, x: Optional[jnp.ndarray] = None,
                 training: bool = False):
        if x is None:
            x = graph.x
        if training and self.dropedge_rate > 0:
            from ...utils.transforms import drop_edge

            g = sym_norm(drop_edge(graph, self.dropedge_rate,
                                   self.make_rng("dropout")))
        else:
            g = sym_norm(graph)
        for i in range(self.num_layers - 1):
            x = GCNLayer(self.hidden_size, dropout=self.dropout,
                         activation="relu", norm=self.norm,
                         name=f"layer{i}")(g, x, training)
        return GCNLayer(self.out_features, name=f"layer{self.num_layers-1}")(
            g, x, training)
