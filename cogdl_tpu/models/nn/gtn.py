"""GTN — graph transformer network: learned soft metapaths via channel-wise
convex combinations of relation adjacencies, composed by SpMM chains
(reference cogdl/models/nn/gtn.py). TPU-first: instead of materialising
A1·A2 products (dense N×N), the learned metapath adjacency is applied
*functionally*: x ← A_k(…A_1(x)) — identical result for the GCN that follows,
at SpMM cost."""

from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...data.graph import Graph
from ...ops import spmm


class GTN(nn.Module):
    in_features: int
    out_features: int
    hidden_size: int = 64
    num_channels: int = 2
    num_gt_layers: int = 2
    dropout: float = 0.5

    @nn.compact
    def __call__(self, graphs, x: Optional[jnp.ndarray] = None,
                 training: bool = False):
        if isinstance(graphs, Graph):
            gs = list(graphs.extras["relation_graphs"])
            if x is None:
                x = graphs.x
        else:
            gs = list(graphs)
            if x is None:
                x = gs[0].x
        R = len(gs)
        outs = []
        for c in range(self.num_channels):
            h = x
            for l in range(self.num_gt_layers):
                alpha = self.param(f"alpha_c{c}_l{l}",
                                   nn.initializers.constant(1.0 / R), (R,))
                a = jax.nn.softmax(alpha)
                # soft relation mixture applied functionally
                h = sum(a[r] * spmm(gs[r], h) for r in range(R))
            outs.append(h)
        z = jnp.concatenate(outs, axis=-1)
        z = nn.relu(nn.Dense(self.hidden_size, name="fc1")(z))
        if self.dropout > 0 and training:
            z = nn.Dropout(rate=self.dropout, deterministic=False)(z)
        return nn.Dense(self.out_features, name="out")(z)
