"""GAT — rebuild of reference cogdl/models/nn/gat.py."""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from ...data.graph import Graph
from ...layers import GATLayer


class GAT(nn.Module):
    in_features: int
    out_features: int
    hidden_size: int = 8          # per-head hidden size
    num_layers: int = 2
    nhead: int = 8
    nhead_last: int = 1
    alpha: float = 0.2
    dropout: float = 0.6
    attn_drop: float = 0.5
    residual: bool = False
    norm: Optional[str] = None
    exact_scores: bool = False

    @nn.compact
    def __call__(self, graph: Graph, x: Optional[jnp.ndarray] = None,
                 training: bool = False):
        if x is None:
            x = graph.x
        for i in range(self.num_layers - 1):
            if self.dropout > 0 and training:
                x = nn.Dropout(rate=self.dropout, deterministic=False)(x)
            x = GATLayer(
                self.hidden_size, nhead=self.nhead, alpha=self.alpha,
                attn_drop=self.attn_drop, activation="elu",
                residual=self.residual, norm=self.norm, concat=True,
                exact_scores=self.exact_scores, name=f"layer{i}",
            )(graph, x, training)
        if self.dropout > 0 and training:
            x = nn.Dropout(rate=self.dropout, deterministic=False)(x)
        return GATLayer(
            self.out_features, nhead=self.nhead_last, alpha=self.alpha,
            attn_drop=self.attn_drop, concat=False,
            exact_scores=self.exact_scores,
            name=f"layer{self.num_layers - 1}",
        )(graph, x, training)
