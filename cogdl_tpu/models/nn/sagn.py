"""SAGN — scalable attention over precomputed k-hop features, with the
multi-stage self-training hooks (reference cogdl/models/nn/sagn.py:161,
261 LoC; staged training contract from sagn_mw.py:38-54)."""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...data.graph import Graph, sym_norm
from ...layers import MLP
from ...ops import spmm


class SAGN(nn.Module):
    in_features: int
    out_features: int
    hidden_size: int = 64
    num_hops: int = 3
    dropout: float = 0.5
    attn_drop: float = 0.4

    @nn.compact
    def __call__(self, graph: Graph, x: Optional[jnp.ndarray] = None,
                 training: bool = False):
        if x is None:
            x = graph.x
        g = sym_norm(graph)
        hops = [x]
        h = x
        for _ in range(self.num_hops):
            h = spmm(g, h)
            hops.append(h)
        # encode each hop, attention-combine
        enc = [nn.Dense(self.hidden_size, name=f"hop{i}")(hi)
               for i, hi in enumerate(hops)]
        z = jnp.stack(enc, axis=1)                     # [N, K+1, H]
        q = self.param("attn_q", nn.initializers.glorot_uniform(),
                       (self.hidden_size, 1))
        scores = jax.nn.leaky_relu(z @ q, 0.2).squeeze(-1)  # [N, K+1]
        att = jax.nn.softmax(scores, axis=1)
        if self.attn_drop > 0 and training:
            att = nn.Dropout(rate=self.attn_drop, deterministic=False)(att)
        mixed = jnp.einsum("nk,nkh->nh", att, z)
        mixed = nn.relu(nn.LayerNorm(name="ln")(mixed))
        if self.dropout > 0 and training:
            mixed = nn.Dropout(rate=self.dropout, deterministic=False)(mixed)
        return nn.Dense(self.out_features, name="out")(mixed)
