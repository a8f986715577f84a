"""DrGCN / DrGAT — dimensional-reweighting (SE-gated) GCN/GAT
(reference cogdl/models/nn/drgcn.py, drgat.py: an SELayer recalibrates
feature channels before each conv)."""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from ...data.graph import Graph, sym_norm
from ...layers import GATLayer, GCNLayer, SELayer


class DrGCN(nn.Module):
    in_features: int
    out_features: int
    hidden_size: int = 64
    num_layers: int = 2
    dropout: float = 0.5

    @nn.compact
    def __call__(self, graph: Graph, x: Optional[jnp.ndarray] = None,
                 training: bool = False):
        if x is None:
            x = graph.x
        g = sym_norm(graph)
        for i in range(self.num_layers - 1):
            x = SELayer(name=f"se{i}")(x, training)
            x = GCNLayer(self.hidden_size, dropout=self.dropout,
                         activation="relu", name=f"gcn{i}")(g, x, training)
        x = SELayer(name=f"se{self.num_layers-1}")(x, training)
        return GCNLayer(self.out_features,
                        name=f"gcn{self.num_layers-1}")(g, x, training)


class DrGAT(nn.Module):
    in_features: int
    out_features: int
    hidden_size: int = 8
    nhead: int = 8
    dropout: float = 0.6

    @nn.compact
    def __call__(self, graph: Graph, x: Optional[jnp.ndarray] = None,
                 training: bool = False):
        if x is None:
            x = graph.x
        x = SELayer(name="se1")(x, training)
        x = GATLayer(self.hidden_size, nhead=self.nhead, attn_drop=self.dropout,
                     activation="elu", concat=True, name="gat1")(graph, x,
                                                                 training)
        x = SELayer(name="se2")(x, training)
        return GATLayer(self.out_features, nhead=1, attn_drop=self.dropout,
                        concat=False, name="gat2")(graph, x, training)
