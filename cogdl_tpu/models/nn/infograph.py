"""InfoGraph — unsupervised whole-graph representation via local-global MI
(reference cogdl/models/nn/infograph.py): GIN encoder, per-layer node
embeddings vs graph summaries, Jensen-Shannon MI discriminator."""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...data.graph import Graph
from ...layers import GINLayer
from ...ops import segment as seg


class InfoGraph(nn.Module):
    in_features: int
    out_features: int = 0  # unused (unsupervised)
    hidden_size: int = 32
    num_layers: int = 3

    def setup(self):
        self.gins = [GINLayer(self.hidden_size, name=f"gin{i}")
                     for i in range(self.num_layers)]
        self.local_d = nn.Dense(self.hidden_size, name="local_d")
        self.global_d = nn.Dense(self.hidden_size, name="global_d")

    def encode(self, graph: Graph, x: jnp.ndarray, training: bool = False):
        graph_id = graph.extras["graph_id"]
        num_graphs = graph.meta_get("num_graphs", 1)
        hs = []
        h = x
        for gin in self.gins:
            h = nn.relu(gin(graph, h, training))
            hs.append(h)
        node_h = jnp.concatenate(hs, axis=-1)
        graph_h = seg.segment_sum(node_h, graph_id, num_graphs)
        return node_h, graph_h

    def __call__(self, graph: Graph, x: Optional[jnp.ndarray] = None,
                 training: bool = False):
        if x is None:
            x = graph.x
        _, graph_h = self.encode(graph, x, training)
        return graph_h

    def mi_scores(self, graph: Graph, x: jnp.ndarray, training: bool = True):
        """[N, G] discriminator grid: positive where node belongs to graph."""
        node_h, graph_h = self.encode(graph, x, training)
        l = self.local_d(node_h)
        g = self.global_d(graph_h)
        return l @ g.T  # [N, G]
