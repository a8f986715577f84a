"""DeeperGCN building blocks: GENConv (softmax/power-mean aggregation) and the
pre-activation residual block ResGNNLayer.

Rebuild of reference cogdl/layers/deepergcn_layer.py (189 LoC).
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..data.graph import Graph
from ..ops import segment as seg
from .mlp import MLP


class GENConv(nn.Module):
    """Generalised aggregation conv (reference cogdl/layers/deepergcn_layer.py:12-104):
    relu(+eps) messages in INPUT space, a softmax / power-mean / mean / max
    aggregator, optional message norm and residual, then the 2-layer update
    MLP (hidden = 2·in) — weight-mappable onto the reference for parity."""

    out_features: int
    aggr: str = "softmax_sg"   # softmax | softmax_sg | powermean | mean | max
    beta: float = 1.0
    p: float = 1.0
    learn_beta: bool = False
    learn_p: bool = False
    residual: bool = False
    use_msg_norm: bool = False
    learn_msg_scale: bool = True
    # None → identity update-MLP, matching the reference GENConv default
    # (deepergcn_layer.py activation=None via get_activation(None));
    # DeeperGCN/RevGCN built with defaults therefore match reference defaults
    activation: object = None
    eps: float = 1e-7

    @nn.compact
    def __call__(self, graph: Graph, x: jnp.ndarray, training: bool = False):
        F_in = x.shape[-1]
        msg = seg.gather(x, graph.col)
        msg = nn.relu(msg) + self.eps
        mask = graph.edge_mask()[:, None]
        if self.aggr in ("softmax", "softmax_sg"):
            beta = (self.param("beta", nn.initializers.constant(self.beta), ())
                    if self.learn_beta else self.beta)
            scores = seg.segment_softmax(msg * beta, graph.row, graph.n_pad,
                                         mask=jnp.broadcast_to(mask, msg.shape))
            if self.aggr == "softmax_sg":
                # the DeeperGCN paper's SoftMax_Sg detaches the aggregation
                # weights (the reference's CPU edge_softmax does not, but
                # its fused CUDA path and the paper do)
                scores = jax.lax.stop_gradient(scores)
            out = seg.segment_sum(jnp.where(mask, msg * scores, 0.0),
                                  graph.row, graph.n_pad)
        elif self.aggr == "powermean":
            p = (self.param("p", nn.initializers.constant(self.p), ())
                 if self.learn_p else self.p)
            mp = jnp.where(mask, jnp.clip(msg, self.eps, 1.0) ** p, 0.0)
            deg = graph.in_degrees()[:, None]
            out = seg.segment_sum(mp, graph.row, graph.n_pad)
            out = (out / jnp.maximum(deg, 1.0)) ** (1.0 / p)
        elif self.aggr == "mean":
            out = seg.segment_mean(jnp.where(mask, msg, 0.0), graph.row, graph.n_pad)
        elif self.aggr == "max":
            out = seg.segment_max(jnp.where(mask, msg, -1e30), graph.row, graph.n_pad)
        else:
            raise ValueError(self.aggr)
        if self.use_msg_norm:
            s = (self.param("s", nn.initializers.ones, ())
                 if self.learn_msg_scale else 1.0)
            x_norm = jnp.linalg.norm(x, axis=1, keepdims=True)
            unit = out / jnp.maximum(
                jnp.linalg.norm(out, axis=1, keepdims=True), 1e-12)
            out = x + s * unit * x_norm
        if self.residual:
            out = out + x
        return MLP(self.out_features, hidden_features=2 * F_in,
                   num_layers=2, activation=self.activation,
                   name="mlp_out")(out, training)


class ResGNNLayer(nn.Module):
    """Pre-activation residual wrapper: x + Conv(Act(Norm(x)))."""
    out_features: int
    aggr: str = "softmax_sg"
    dropout: float = 0.0
    norm: str = "batchnorm"   # layernorm under remat (batch_stats can't
    #                           mutate inside a checkpointed scope)

    @nn.compact
    def __call__(self, graph: Graph, x: jnp.ndarray, training: bool = False):
        if self.norm == "layernorm":
            h = nn.LayerNorm(name="norm")(x)
        else:
            from .utils import MaskedBatchNorm

            h = MaskedBatchNorm(name="norm")(
                x, graph.node_mask(), use_running_average=not training)
        h = nn.relu(h)
        if self.dropout > 0 and training:
            h = nn.Dropout(rate=self.dropout, deterministic=False)(h)
        h = GENConv(self.out_features, aggr=self.aggr, name="conv")(graph, h, training)
        return x + h
