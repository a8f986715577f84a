"""GRAND: random propagation + consistency regularisation.

Rebuild of reference cogdl/models/nn/grand.py + grand_mw (consistency over S
augmentations). TPU-first: the S augmentation samples are vmapped — one
compiled program, S parallel DropNode propagations on the MXU/VPU.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...data.graph import Graph, sym_norm
from ...layers import MLP
from ...ops import spmm


class Grand(nn.Module):
    in_features: int
    out_features: int
    hidden_size: int = 32
    order: int = 8            # propagation steps
    input_dropout: float = 0.5
    hidden_dropout: float = 0.5
    dropnode_rate: float = 0.5

    def random_propagate(self, graph: Graph, x: jnp.ndarray, rng) -> jnp.ndarray:
        """DropNode + mean of K-hop propagations (grand.py rand_prop)."""
        keep = jax.random.bernoulli(rng, 1.0 - self.dropnode_rate,
                                    (x.shape[0], 1))
        h = x * keep / (1.0 - self.dropnode_rate)
        acc = h
        for _ in range(self.order):
            h = spmm(graph, h)
            acc = acc + h
        return acc / (self.order + 1)

    @nn.compact
    def __call__(self, graph: Graph, x: Optional[jnp.ndarray] = None,
                 training: bool = False):
        if x is None:
            x = graph.x
        graph = sym_norm(graph)
        if training:
            rng = self.make_rng("dropout")
            x = self.random_propagate(graph, x, rng)
        else:
            h = x
            acc = h
            for _ in range(self.order):
                h = spmm(graph, h)
                acc = acc + h
            x = acc / (self.order + 1)
        if self.input_dropout > 0 and training:
            x = nn.Dropout(rate=self.input_dropout, deterministic=False)(x)
        return MLP(self.out_features, hidden_features=self.hidden_size,
                   num_layers=2, dropout=self.hidden_dropout if training else 0.0,
                   name="mlp")(x, training)
