"""HAN — heterogeneous attention network over metapath graphs
(reference cogdl/models/nn/han.py)."""

from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp

from ...data.graph import Graph
from ...layers import HANLayer


class HAN(nn.Module):
    in_features: int
    out_features: int
    hidden_size: int = 8
    nhead: int = 8
    num_metapaths: int = 2
    num_layers: int = 1
    dropout: float = 0.5

    @nn.compact
    def __call__(self, graphs, x: Optional[jnp.ndarray] = None,
                 training: bool = False):
        """``graphs``: list of per-metapath Graphs (or a Graph with
        extras['metapath_graphs'])."""
        if isinstance(graphs, Graph):
            gs = graphs.extras["metapath_graphs"]
            if x is None:
                x = graphs.x
        else:
            gs = list(graphs)
            if x is None:
                x = gs[0].x
        for i in range(self.num_layers):
            x = HANLayer(self.hidden_size, nhead=self.nhead,
                         num_metapaths=len(gs), dropout=self.dropout,
                         name=f"han{i}")(gs, x, training)
        return nn.Dense(self.out_features, name="out")(x)
