"""SIGN: precomputed multi-hop propagation + per-hop MLPs.

Rebuild of reference cogdl/models/nn/sign.py — the propagation happens once
(no deep activations), each hop gets its own encoder, concatenated into the
classifier. The k-hop features are computed inside the first forward and are
jit-constant-folded thereafter when x is static.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from ...data.graph import Graph, sym_norm
from ...ops import spmm


class SIGN(nn.Module):
    in_features: int
    out_features: int
    hidden_size: int = 64
    num_hops: int = 3
    dropout: float = 0.5

    @nn.compact
    def __call__(self, graph: Graph, x: Optional[jnp.ndarray] = None,
                 training: bool = False):
        if x is None:
            x = graph.x
        graph = sym_norm(graph)
        hops = [x]
        h = x
        for _ in range(self.num_hops):
            h = spmm(graph, h)
            hops.append(h)
        encoded = []
        for i, hi in enumerate(hops):
            e = nn.Dense(self.hidden_size, name=f"hop{i}")(hi)
            e = nn.relu(e)
            if self.dropout > 0 and training:
                e = nn.Dropout(rate=self.dropout, deterministic=False)(e)
            encoded.append(e)
        z = jnp.concatenate(encoded, axis=-1)
        return nn.Dense(self.out_features, name="out")(z)
