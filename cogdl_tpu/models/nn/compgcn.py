"""CompGCN — composition-based relational GCN for KG link prediction
(reference cogdl/models/nn/compgcn.py). Composition = subtraction (TransE-style)
by default; entity/relation embeddings learned jointly, DistMult scoring."""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from ...data.graph import Graph
from ...ops import segment as seg


class CompGCNLayer(nn.Module):
    out_features: int
    comp: str = "sub"  # sub | mult

    @nn.compact
    def __call__(self, graph: Graph, x: jnp.ndarray, rel: jnp.ndarray,
                 training: bool = False):
        if graph.edge_type is None:
            raise ValueError("CompGCN needs graph.edge_type")
        src = seg.gather(x, graph.col)
        r = rel[graph.edge_type]
        msg = src - r if self.comp == "sub" else src * r
        msg = msg * graph.edge_weight[:, None]
        agg = seg.segment_sum(msg, graph.row, graph.n_pad)
        deg = graph.in_degrees(weighted=True)[:, None]
        agg = agg / jnp.maximum(deg, 1.0)
        out = nn.Dense(self.out_features, use_bias=False, name="W_nbr")(agg)
        out = out + nn.Dense(self.out_features, use_bias=False, name="W_self")(x)
        rel_out = nn.Dense(self.out_features, use_bias=False, name="W_rel")(rel)
        return out, rel_out


class CompGCN(nn.Module):
    in_features: int
    out_features: int
    num_relations: int = 4
    num_entities: int = 0       # when >0, learn entity embeddings (no x)
    hidden_size: int = 64
    num_layers: int = 2
    dropout: float = 0.1
    # return (z, rel) so KG link prediction can score with the layer-
    # transformed relation embeddings (reference compgcn.py:324 predict)
    return_rel: bool = False

    @nn.compact
    def __call__(self, graph: Graph, x: Optional[jnp.ndarray] = None,
                 training: bool = False):
        if x is None and self.num_entities:
            x = nn.Embed(self.num_entities, self.hidden_size, name="ent")(
                jnp.arange(graph.n_pad) % max(self.num_entities, 1))
        elif x is None:
            x = graph.x
        rel = self.param("rel", nn.initializers.glorot_uniform(),
                         (self.num_relations, x.shape[-1]))
        for i in range(self.num_layers - 1):
            x, rel = CompGCNLayer(self.hidden_size, name=f"layer{i}")(
                graph, x, rel, training)
            x = jnp.tanh(x)
            if self.dropout > 0 and training:
                x = nn.Dropout(rate=self.dropout, deterministic=False)(x)
        x, rel = CompGCNLayer(self.out_features,
                              name=f"layer{self.num_layers-1}")(graph, x, rel,
                                                                training)
        if self.return_rel:
            return x, rel
        return x
