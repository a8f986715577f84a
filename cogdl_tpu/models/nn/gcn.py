"""GCN (Kipf & Welling) — rebuild of reference cogdl/models/nn/gcn.py:6.

Forward contract: ``model(graph, x=None, training=False) -> logits[N_pad, C]``.
Normalisation (sym by default) is applied inside the model like the reference's
``graph.sym_norm()`` call (models/nn/gcn.py:72) but as a pure transform.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from ...data.graph import Graph, sym_norm, row_norm
from ...layers import GCNLayer


class GCN(nn.Module):
    in_features: int
    out_features: int
    hidden_size: int = 64
    num_layers: int = 2
    dropout: float = 0.5
    activation: str = "relu"
    norm: Optional[str] = None
    residual: bool = False
    adj_norm: str = "sym"  # sym | row | none
    # consume extras["prop_x"/"prop_s"] (ops.cache_propagation) for the first
    # layer when exact: input is graph.x and no dropout touches it. Removes
    # the first layer's SpMM gather sweep from forward AND backward.
    use_prop_cache: bool = True

    @nn.compact
    def __call__(self, graph: Graph, x: Optional[jnp.ndarray] = None,
                 training: bool = False, return_hidden: bool = False):
        prop = None
        if (self.use_prop_cache and (x is None or x is graph.x)
                and not self.residual
                and graph.extras and "prop_x" in graph.extras
                and not (self.dropout > 0 and training)):
            prop = (graph.extras["prop_x"], graph.extras["prop_s"])
        if x is None:
            x = graph.x
        if self.adj_norm == "sym":
            graph = sym_norm(graph)
        elif self.adj_norm == "row":
            graph = row_norm(graph)
        if self.dropout > 0 and training:
            x = nn.Dropout(rate=self.dropout, deterministic=False)(x)
        for i in range(self.num_layers - 1):
            x = GCNLayer(
                self.hidden_size,
                dropout=self.dropout,
                activation=self.activation,
                residual=self.residual,
                norm=self.norm,
                name=f"layer{i}",
            )(graph, x, training, prop=prop if i == 0 else None)
        if return_hidden:
            return x
        return GCNLayer(self.out_features, name=f"layer{self.num_layers - 1}")(
            graph, x, training, prop=prop if self.num_layers == 1 else None)

    def embed(self, graph: Graph, x: Optional[jnp.ndarray] = None):
        """Penultimate-layer embeddings (reference ``predict``-style hook)."""
        return self(graph, x, False, return_hidden=True)
