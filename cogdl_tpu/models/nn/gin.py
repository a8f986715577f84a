"""GIN for graph classification — rebuild of reference cogdl/models/nn/gin.py.

Consumes a batched multi-graph (disconnected union built by
cogdl_tpu.data.batch) and pools per-graph with segment sums over the
``graph_id`` vector; sum-readout of every layer like the reference.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from ...data.graph import Graph
from ...layers import GINLayer
from ...ops import segment as seg


class GIN(nn.Module):
    in_features: int
    out_features: int
    hidden_size: int = 32
    num_layers: int = 3
    num_mlp_layers: int = 2
    eps: float = 0.0
    train_eps: bool = True
    dropout: float = 0.5
    pooling: str = "sum"

    @nn.compact
    def __call__(self, graph: Graph, x: Optional[jnp.ndarray] = None,
                 training: bool = False):
        """Returns per-graph logits when graph.extras['graph_id'] exists
        (batched multi-graph), otherwise per-node logits."""
        if x is None:
            x = graph.x
        graph_id = None if not graph.extras else graph.extras.get("graph_id")
        num_graphs = graph.meta_get("num_graphs", 1)

        layer_outputs = [x]
        h = x
        for i in range(self.num_layers - 1):
            h = GINLayer(self.hidden_size, eps=self.eps, train_eps=self.train_eps,
                         name=f"gin{i}")(graph, h, training)
            h = nn.relu(h)
            layer_outputs.append(h)

        score = 0.0
        for i, h_i in enumerate(layer_outputs):
            if graph_id is not None:
                if self.pooling == "mean":
                    pooled = seg.segment_mean(h_i, graph_id, num_graphs)
                else:
                    pooled = seg.segment_sum(h_i, graph_id, num_graphs, sorted=True)
            else:
                pooled = h_i
            out = nn.Dense(self.out_features, name=f"readout{i}")(pooled)
            if self.dropout > 0 and training:
                out = nn.Dropout(rate=self.dropout, deterministic=False)(out)
            score = score + out
        return score
