"""AutoGNN — the search-space meta-model for AutoML
(reference cogdl/models/nn/autognn.py): exposes a layer-type choice so the
searcher explores {gcn, gat, sage, gcnii} × width × dropout."""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from ...data.graph import Graph


class AutoGNN(nn.Module):
    in_features: int
    out_features: int
    conv_type: str = "gcn"     # gcn | gat | sage
    hidden_size: int = 64
    num_layers: int = 2
    dropout: float = 0.5

    @nn.compact
    def __call__(self, graph: Graph, x: Optional[jnp.ndarray] = None,
                 training: bool = False):
        from .gat import GAT
        from .gcn import GCN
        from .graphsage import GraphSAGE

        cls = {"gcn": GCN, "gat": GAT, "sage": GraphSAGE,
               "graphsage": GraphSAGE}[self.conv_type]
        kw = dict(in_features=self.in_features,
                  out_features=self.out_features,
                  num_layers=self.num_layers, dropout=self.dropout)
        if self.conv_type == "gat":
            kw["hidden_size"] = max(self.hidden_size // 8, 4)
        else:
            kw["hidden_size"] = self.hidden_size
        return cls(**kw, name="backbone")(graph, x, training)


AUTOGNN_SEARCH_SPACE = {
    "conv_type": ("categorical", ["gcn", "gat", "sage"]),
    "hidden_size": ("categorical", [32, 64, 128]),
    "num_layers": ("int", 2, 3),
    "dropout": ("uniform", 0.2, 0.7),
    "lr": ("loguniform", 1e-3, 1e-1),
}
