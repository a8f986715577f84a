"""HAN layer: per-metapath GAT + semantic-level attention across metapaths.

Rebuild of reference ``HANLayer`` (cogdl/layers/han_layer.py). Each metapath
is its own (statically shaped) Graph; semantic attention is a tiny softmax
over the metapath axis.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..data.graph import Graph
from .gat_layer import GATLayer


class HANLayer(nn.Module):
    out_features: int
    nhead: int = 8
    num_metapaths: int = 2
    dropout: float = 0.5
    # semantic attention flavour: "han" = the HAN paper's shared
    # tanh-MLP + query + softmax over metapaths; "linear" = the reference
    # package's AttentionLayer (cogdl/layers/han_layer.py:7-14 — a per-node
    # linear score, NO softmax), kept for activation parity
    sem_att: str = "han"

    @nn.compact
    def __call__(self, graphs: Sequence[Graph], x: jnp.ndarray,
                 training: bool = False):
        assert len(graphs) == self.num_metapaths
        embs = []
        for i, g in enumerate(graphs):
            embs.append(
                GATLayer(self.out_features, nhead=self.nhead,
                         attn_drop=self.dropout, concat=True,
                         name=f"gat{i}")(g, x, training)
            )
        z = jnp.stack(embs, axis=1)  # [N, M, H*D]
        if self.sem_att == "linear":
            att = nn.Dense(1, name="att_fc")(z)          # [N, M, 1]
            return jnp.einsum("nm,nmf->nf", att.squeeze(-1), z)
        # semantic attention: shared MLP scores each metapath embedding
        w = nn.Dense(128, name="sem_fc")(z)
        w = jnp.tanh(w)
        q = self.param("sem_q", nn.initializers.glorot_uniform(), (128, 1))
        score = (w @ q).mean(axis=0).squeeze(-1)          # [M]
        beta = jax.nn.softmax(score)
        return jnp.einsum("m,nmf->nf", beta, z)
