"""RevGCN — reversible GCN for O(1)-activation deep training.

Rebuild of reference cogdl/models/nn/revgcn.py + layers/reversible_layer.py
(509 LoC of custom autograd). TPU-first: instead of hand-written backward
recomputation (InvertibleCheckpoint), we express the same additive coupling
      x1', x2' = x1 + F(x2), x2 + G(x1')
and let ``jax.checkpoint`` (remat) provide the memory/compute trade — XLA
recomputes the forward inside the backward pass, which is the identical
FLOP/memory profile without 500 lines of autograd machinery.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...data.graph import Graph, sym_norm
from ...layers import GCNLayer


class RevBlock(nn.Module):
    features: int
    dropout: float = 0.0
    conv: str = "gcn"        # gcn | gat | gen (reference RevGCN/RevGAT/RevGEN)
    nhead: int = 2

    def _make(self, name: str):
        if self.conv == "gat":
            from ...layers import GATLayer

            assert self.features % self.nhead == 0
            return GATLayer(self.features // self.nhead, nhead=self.nhead,
                            attn_drop=self.dropout, activation="relu",
                            name=name)
        if self.conv == "gen":
            from ...layers import GENConv

            return GENConv(self.features, name=name)
        return GCNLayer(self.features, activation="relu",
                        dropout=self.dropout, name=name)

    @nn.compact
    def __call__(self, graph: Graph, x1: jnp.ndarray, x2: jnp.ndarray,
                 training: bool = False):
        y1 = x1 + self._make("F")(graph, x2, training)
        y2 = x2 + self._make("G")(graph, y1, training)
        return y1, y2


class RevGCN(nn.Module):
    in_features: int
    out_features: int
    hidden_size: int = 64
    num_layers: int = 8
    dropout: float = 0.1
    group: int = 2
    conv: str = "gcn"
    nhead: int = 2

    @nn.compact
    def __call__(self, graph: Graph, x: Optional[jnp.ndarray] = None,
                 training: bool = False):
        if x is None:
            x = graph.x
        g = sym_norm(graph)
        h = nn.Dense(self.hidden_size * 2, name="fc_in")(x)
        x1, x2 = jnp.split(h, 2, axis=-1)
        Block = nn.remat(RevBlock, static_argnums=(4,))
        for i in range(self.num_layers):
            x1, x2 = Block(self.hidden_size, dropout=self.dropout,
                           conv=self.conv, nhead=self.nhead,
                           name=f"block{i}")(g, x1, x2, training)
        h = jnp.concatenate([x1, x2], axis=-1)
        h = nn.relu(h)
        return nn.Dense(self.out_features, name="fc_out")(h)


class RevGAT(RevGCN):
    """Reversible GAT (reference cogdl/models/nn/revgcn.py:209) — additive
    coupling with GAT attention blocks under remat."""
    conv: str = "gat"


class RevGEN(RevGCN):
    """Reversible DeeperGCN/GENConv (reference cogdl/models/nn/revgcn.py:108)."""
    conv: str = "gen"
