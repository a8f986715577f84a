"""GraphSAINT (reference cogdl/models/nn/graphsaint.py + layers/saint_layer.py).

The real SAINT architecture: an ``architecture`` string like ``"1-1-0"``
gives each layer's propagation order (reference ``parse_arch``,
graphsaint.py:10), layers are high-order aggregators with concat mixing,
the final embedding is L2-normalised before a linear classifier
(graphsaint.py:126-131 ``forward``).

The UNBIASED estimator — the part that makes SAINT SAINT — lives in
``wrappers.sampled_node_classification.GraphSAINTWrapper``: pre-sampling
estimation of node/edge inclusion counts, loss weights ``norm_loss`` and
aggregation rescaling ``norm_aggr`` (graphsaint.py:133 ``_loss``; the
reference ships the loss hook but never computes the coefficients — here
both halves are implemented, following the original GraphSAINT minibatch
estimation)."""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...data.graph import Graph, sym_norm
from ...layers.saint_layer import SAINTLayer


class GraphSAINT(nn.Module):
    in_features: int
    out_features: int
    hidden_size: int = 128
    architecture: str = "1-1-0"
    aggr: str = "concat"
    act: str = "relu"
    bias: str = "norm"
    dropout: float = 0.1
    adj_norm: str = "sym"

    @nn.compact
    def __call__(self, graph: Graph, x: Optional[jnp.ndarray] = None,
                 training: bool = False):
        if x is None:
            x = graph.x
        if self.adj_norm == "sym":
            graph = sym_norm(graph)
        orders = [int(o) for o in self.architecture.split("-")]
        for i, order in enumerate(orders):
            x = SAINTLayer(self.hidden_size, order=order, aggr=self.aggr,
                           act=self.act, bias=self.bias,
                           dropout=self.dropout, name=f"layer{i}")(
                               graph, x, training)
        x = x * jax.lax.rsqrt(jnp.sum(x * x, -1, keepdims=True) + 1e-12)
        return nn.Dense(self.out_features, name="classifier")(x)
