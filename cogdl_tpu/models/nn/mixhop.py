"""MixHop — rebuild of reference cogdl/models/nn/mixhop.py."""

from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp

from ...data.graph import Graph, sym_norm
from ...layers import MixHopLayer


class MixHop(nn.Module):
    in_features: int
    out_features: int
    hidden_size: int = 64      # per-power width
    num_layers: int = 2
    dropout: float = 0.7
    powers: Sequence[int] = (0, 1, 2)

    @nn.compact
    def __call__(self, graph: Graph, x: Optional[jnp.ndarray] = None,
                 training: bool = False):
        if x is None:
            x = graph.x
        graph = sym_norm(graph)
        for i in range(self.num_layers):
            if self.dropout > 0 and training:
                x = nn.Dropout(rate=self.dropout, deterministic=False)(x)
            x = MixHopLayer(self.hidden_size, powers=tuple(self.powers),
                            name=f"layer{i}")(graph, x, training)
            x = nn.tanh(x)
        return nn.Dense(self.out_features, name="fc_out")(x)
