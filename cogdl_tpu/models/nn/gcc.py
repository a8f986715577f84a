"""GCC — graph contrastive coding: GIN encoder over positional (eigen)
features for transferable structural representations
(reference cogdl/models/nn/gcc_model.py; pretraining loop in gcc_mw.py
uses an InfoNCE queue — here the E2E wrapper uses in-batch negatives)."""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...data.graph import Graph
from ...layers import GINLayer, Set2Set
from ...ops import segment as seg


class GCC(nn.Module):
    """readout="set2set" follows the reference encoder
    (gcc_model.py:252,310: Set2Set(hidden, 6 steps, 3 layers) then a
    Linear-ReLU-Linear head); readout="sum" keeps the plain segment_sum
    path used in earlier rounds."""

    in_features: int
    out_features: int = 64
    hidden_size: int = 64
    num_layers: int = 5
    readout: str = "set2set"
    set2set_steps: int = 6
    set2set_layers: int = 3

    @nn.compact
    def __call__(self, graph: Graph, x: Optional[jnp.ndarray] = None,
                 training: bool = False):
        if x is None:
            x = graph.x
        graph_id = None if not graph.extras else graph.extras.get("graph_id")
        num_graphs = graph.meta_get("num_graphs", 1)
        h = x
        for i in range(self.num_layers):
            h = nn.relu(GINLayer(self.hidden_size, name=f"gin{i}")(graph, h,
                                                                   training))
        if graph_id is not None:
            if self.readout == "set2set":
                h = Set2Set(self.hidden_size, self.set2set_steps,
                            self.set2set_layers, name="set2set")(
                                h, graph_id, num_graphs)
                h = nn.relu(nn.Dense(self.hidden_size, name="readout_lin")(h))
            else:
                h = seg.segment_sum(h, graph_id, num_graphs)
        z = nn.Dense(self.out_features, name="proj")(h)
        return z * jax.lax.rsqrt(jnp.sum(z ** 2, -1, keepdims=True) + 1e-12)
