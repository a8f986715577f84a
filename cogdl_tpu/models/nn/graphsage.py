"""GraphSAGE — rebuild of reference cogdl/models/nn/graphsage.py:35,122,193.

Full-batch forward here; the sampled mini-batch path consumes per-hop block
graphs from cogdl_tpu.data.sampling (each block is a statically shaped Graph).
UnsupGraphSAGE pairs it with a random-walk positive/negative loss.
"""

from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp

from ...data.graph import Graph
from ...layers import SAGELayer


class GraphSAGE(nn.Module):
    in_features: int
    out_features: int
    hidden_size: int = 64
    num_layers: int = 2
    aggr: str = "mean"
    dropout: float = 0.5
    normalize: bool = False

    @nn.compact
    def __call__(self, graph, x: Optional[jnp.ndarray] = None,
                 training: bool = False):
        """``graph`` is a Graph (full batch) or a sequence of per-hop block
        Graphs (sampled mini-batch, one block per layer)."""
        blocks = graph if isinstance(graph, (list, tuple)) else [graph] * self.num_layers
        if x is None:
            x = blocks[0].x
        for i in range(self.num_layers - 1):
            x = SAGELayer(self.hidden_size, aggr=self.aggr,
                          normalize=self.normalize, dropout=self.dropout,
                          activation="relu", name=f"layer{i}")(blocks[i], x, training)
        return SAGELayer(self.out_features, aggr=self.aggr,
                         name=f"layer{self.num_layers - 1}")(blocks[-1], x, training)


    def inference(self, graph: Graph, x: Optional[jnp.ndarray] = None):
        """Layer-wise full-graph inference (reference graphsage.py:106):
        apply each layer over the whole graph before moving to the next —
        O(num_layers · E) instead of O(fanout^L) per node. Jit-compatible
        because the full graph is statically shaped."""
        if x is None:
            x = graph.x
        for i in range(self.num_layers - 1):
            x = SAGELayer(self.hidden_size, aggr=self.aggr,
                          normalize=self.normalize, activation="relu",
                          name=f"layer{i}")(graph, x, False)
        return SAGELayer(self.out_features, aggr=self.aggr,
                         name=f"layer{self.num_layers - 1}")(graph, x, False)


class UnsupGraphSAGE(GraphSAGE):
    """Same encoder; trained with the unsupervised skip-gram-style loss in
    wrappers (reference models/nn/graphsage.py:193)."""
