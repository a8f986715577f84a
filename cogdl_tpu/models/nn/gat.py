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
    def __call__(self, graph, x: Optional[jnp.ndarray] = None,
                 training: bool = False):
        """``graph`` is a Graph (full batch) or a sequence of per-hop block
        Graphs (sampled mini-batch, outermost-first — the GraphSAGE blocks
        contract, enabling neighbor-sampled GAT training the reference's
        full-batch-only GAT cannot do)."""
        blocks = (list(graph) if isinstance(graph, (list, tuple))
                  else [graph] * self.num_layers)
        if x is None:
            x = blocks[0].x
        for i in range(self.num_layers - 1):
            if self.dropout > 0 and training:
                x = nn.Dropout(rate=self.dropout, deterministic=False)(x)
            x = GATLayer(
                self.hidden_size, nhead=self.nhead, alpha=self.alpha,
                attn_drop=self.attn_drop, activation="elu",
                residual=self.residual, norm=self.norm, concat=True,
                exact_scores=self.exact_scores, name=f"layer{i}",
            )(blocks[i], x, training)
        if self.dropout > 0 and training:
            x = nn.Dropout(rate=self.dropout, deterministic=False)(x)
        return GATLayer(
            self.out_features, nhead=self.nhead_last, alpha=self.alpha,
            attn_drop=self.attn_drop, concat=False,
            exact_scores=self.exact_scores,
            name=f"layer{self.num_layers - 1}",
        )(blocks[-1], x, training)
