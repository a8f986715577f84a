"""Simple-HGN — GAT with edge-type attention terms and attention residuals.

Rebuild of the reference's leaderboard heterogeneous model
(examples/simple_hgn/conv.py myGATConv, run.py SimpleHGN; "Are we really
making much progress? Revisiting heterogeneous GNNs"). Each layer scores an
edge by three halves — a_l·h[dst] + a_r·h[src] + a_e·emb[edge_type] — then
edge-softmaxes per destination, mixes the attention with the previous
layer's (res_attn · alpha), aggregates per head, and adds a linear residual.
Final logits are L2-normalised (reference run.py:128).

TPU-native formulation: the typed graph stays ONE static padded edge list
(edge_type per edge) — no per-type subgraph loop; scores/softmax/aggregation
ride the shared segment ops with a static pad-edge mask, so the whole model
is one XLA program.
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...data.graph import Graph
from ...ops import segment as seg


class SimpleHGNConv(nn.Module):
    """One Simple-HGN layer (reference examples/simple_hgn/conv.py:11)."""

    out_features: int
    num_etypes: int
    nhead: int = 8
    edge_dim: int = 64
    feat_drop: float = 0.5
    attn_drop: float = 0.5
    negative_slope: float = 0.05
    residual: bool = False
    activation: bool = True
    alpha: float = 0.05          # attention-residual mixing

    @nn.compact
    def __call__(self, graph: Graph, x: jnp.ndarray,
                 res_attn: Optional[jnp.ndarray], training: bool = False
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        H, D = self.nhead, self.out_features
        if self.feat_drop > 0 and training:
            x = nn.Dropout(rate=self.feat_drop, deterministic=False)(x)
        h = nn.Dense(H * D, use_bias=False, name="W")(x).reshape(-1, H, D)
        # typed-edge embeddings and their per-head projection
        emb = self.param("edge_emb", nn.initializers.glorot_uniform(),
                         (self.num_etypes, self.edge_dim))
        e = nn.Dense(H * self.edge_dim, use_bias=False, name="W_e")(
            emb).reshape(self.num_etypes, H, self.edge_dim)

        a_l = self.param("a_l", nn.initializers.glorot_uniform(), (1, H, D))
        a_r = self.param("a_r", nn.initializers.glorot_uniform(), (1, H, D))
        a_e = self.param("a_e", nn.initializers.glorot_uniform(),
                         (1, H, self.edge_dim))
        sd = jnp.sum(a_l * h, axis=-1)                    # [N, H]
        ss = jnp.sum(a_r * h, axis=-1)
        se = jnp.sum(a_e * e, axis=-1)                    # [T, H]

        row, col = graph.row, graph.col
        etype = (graph.edge_type if graph.edge_type is not None
                 else jnp.zeros(row.shape, jnp.int32))
        scores = (jnp.take(sd, row, axis=0) + jnp.take(ss, col, axis=0)
                  + jnp.take(se, jnp.clip(etype, 0, self.num_etypes - 1),
                             axis=0))
        scores = jax.nn.leaky_relu(scores, self.negative_slope)
        mask = jnp.arange(row.shape[0]) < graph.num_edges  # static pad mask
        att = seg.segment_softmax(scores, row, graph.n_pad, mask=mask,
                                  sorted=False)
        if self.attn_drop > 0 and training:
            att = nn.Dropout(rate=self.attn_drop, deterministic=False)(att)
        if res_attn is not None:
            att = att * (1.0 - self.alpha) + res_attn * self.alpha

        # flat [N, H*D] gather (3-D gathers tile as D-lane rows on TPU)
        msg = jnp.take(h.reshape(-1, H * D), col, axis=0,
                       mode="clip").reshape(-1, H, D) * att[:, :, None]
        out = seg.segment_sum(msg, row, graph.n_pad, sorted=False)
        out = out.reshape(-1, H * D)
        if self.residual:
            out = out + nn.Dense(H * D, name="res")(x)
        if self.activation:
            out = nn.elu(out)
        # detached attention feeds the next layer's residual mix
        return out, jax.lax.stop_gradient(att)


class SimpleHGN(nn.Module):
    """Reference examples/simple_hgn/run.py:15 SimpleHGN — input projection
    layer, ``num_layers - 1`` hidden layers with residuals, and a 1-head
    output projection with L2-normalised logits."""

    in_features: int
    out_features: int
    hidden_size: int = 64
    num_layers: int = 2
    nhead: int = 8
    edge_dim: int = 64
    num_etypes: int = 5
    dropout: float = 0.5
    attn_drop: float = 0.5
    negative_slope: float = 0.05
    residual: bool = True
    alpha: float = 0.05

    @nn.compact
    def __call__(self, graph: Graph, x: Optional[jnp.ndarray] = None,
                 training: bool = False):
        if isinstance(graph, (list, tuple)):
            graph = graph[0]
        if x is None:
            x = graph.x
        num_etypes = max(self.num_etypes,
                         int(graph.meta_get("num_relations", 1) or 1))
        kw = dict(num_etypes=num_etypes, edge_dim=self.edge_dim,
                  feat_drop=self.dropout, attn_drop=self.attn_drop,
                  negative_slope=self.negative_slope, alpha=self.alpha)
        res_attn = None
        h = x
        for i in range(self.num_layers):
            h, res_attn = SimpleHGNConv(
                self.hidden_size, nhead=self.nhead, residual=(i > 0) and
                self.residual, activation=True, name=f"layer{i}", **kw,
            )(graph, h, res_attn, training)
        logits, _ = SimpleHGNConv(
            self.out_features, nhead=1, residual=self.residual,
            activation=False, name="out", **kw,
        )(graph, h, None, training)
        # rsqrt(x+eps) keeps grads finite on zero (pad) rows — linalg.norm's
        # vjp NaNs at 0 (same fix as disengcn.py)
        sq = jnp.sum(logits * logits, axis=1, keepdims=True)
        return logits * jax.lax.rsqrt(jnp.maximum(sq, 1e-24))
