"""Graph U-Net — gPool/gUnpool with static shapes.

Rebuild of reference cogdl/models/nn/graph_unet.py. TPU-first: pooling keeps
static shapes by *masking* instead of slicing — selected nodes keep their
rows, unselected rows are zeroed, so every level works on [N_pad, F] and the
jit never re-traces.
"""

from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...data.graph import Graph, sym_norm
from ...layers import GCNLayer


class GraphUnet(nn.Module):
    in_features: int
    out_features: int
    hidden_size: int = 64
    pooling_rates: Sequence[float] = (0.5, 0.5)
    dropout: float = 0.3

    @nn.compact
    def __call__(self, graph: Graph, x: Optional[jnp.ndarray] = None,
                 training: bool = False):
        if x is None:
            x = graph.x
        g = sym_norm(graph)
        h = GCNLayer(self.hidden_size, activation="relu", name="in_gcn")(
            g, x, training)
        skips = []
        masks = []
        mask = graph.node_mask().astype(h.dtype)[:, None]
        depth = len(self.pooling_rates)
        for d, rate in enumerate(self.pooling_rates):
            skips.append(h)
            # gPool: score nodes, keep top-k by soft mask
            p = self.param(f"pool_w{d}", nn.initializers.glorot_uniform(),
                           (h.shape[-1], 1))
            score = (h @ p).squeeze(-1) * jax.lax.rsqrt(
                jnp.sum(p ** 2) + 1e-12)
            score = jnp.where(mask.squeeze(-1) > 0, score, -1e30)
            k = max(int(rate * graph.num_nodes), 1)
            thresh = jax.lax.top_k(score, k)[0][-1]
            keep = (score >= thresh).astype(h.dtype)[:, None] * mask
            h = h * keep * jax.nn.sigmoid(score)[:, None]
            masks.append(keep)
            mask = keep
            h = GCNLayer(self.hidden_size, activation="relu",
                         name=f"down_gcn{d}")(g, h, training)
        for d in reversed(range(depth)):
            # gUnpool: restore skip connection
            h = h * masks[d] + skips[d]
            h = GCNLayer(self.hidden_size, activation="relu",
                         name=f"up_gcn{d}")(g, h, training)
        if self.dropout > 0 and training:
            h = nn.Dropout(rate=self.dropout, deterministic=False)(h)
        return nn.Dense(self.out_features, name="out")(h)
