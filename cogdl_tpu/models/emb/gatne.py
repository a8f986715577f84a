"""GATNE — multiplex network embedding: base embedding + per-edge-type
attention over aggregated type-specific neighbor embeddings
(reference cogdl/models/emb/gatne.py). Simplified transductive variant with
jitted training over per-type walks."""

from __future__ import annotations

from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ...data.graph import Graph
from .base import EmbeddingModel
from .walks import build_csr, random_walks, train_sgns, walks_to_pairs


class GATNE(EmbeddingModel):
    def __init__(self, hidden_size: int = 64, edge_dim: int = 8,
                 walk_length: int = 10, walk_num: int = 5,
                 window_size: int = 3, negative: int = 5, iteration: int = 2,
                 seed: int = 0, **kw):
        super().__init__(hidden_size, seed)
        self.edge_dim = edge_dim
        self.walk_length = walk_length
        self.walk_num = walk_num
        self.window_size = window_size
        self.negative = negative
        self.iteration = iteration

    def train_embeddings(self, graph: Graph) -> Dict[int, np.ndarray]:
        """Returns {edge_type: [N, D] embedding} — one view per layer of the
        multiplex graph (plus 0 = base when untyped).

        The reference (gatne.py:104) learns a shared base embedding plus a
        type-specific ``edge_dim``-sized u-embedding combined through
        attention. Rebuilt here as: base SGNS over the MERGED graph +
        per-type SGNS at ``edge_dim`` dimensions projected into the base
        space by a fixed JL projection — same decomposition (shared base,
        small per-type correction, capacity set by ``edge_dim``), without
        the trained attention head."""
        E = graph.num_edges
        etype = (np.asarray(graph.edge_type)[:E]
                 if graph.edge_type is not None else np.zeros(E, np.int64))
        row = np.asarray(graph.row)[:E]
        col = np.asarray(graph.col)[:E]
        from ...data.graph import from_coo

        def sgns_on(r, c, dim, seed):
            g_t = from_coo(np.stack([r, c]), num_nodes=graph.num_nodes)
            indptr, indices = build_csr(g_t)
            walks = random_walks(indptr, indices, self.walk_num,
                                 self.walk_length, seed=seed)
            pairs = walks_to_pairs(walks, self.window_size, seed=self.seed,
                                   max_pairs=1_000_000)
            return train_sgns(pairs, graph.num_nodes, dim=dim,
                              num_negative=self.negative,
                              epochs=self.iteration, seed=seed)

        base = sgns_on(row, col, self.hidden_size, self.seed)
        proj = (np.random.default_rng(self.seed)
                .normal(size=(self.edge_dim, self.hidden_size))
                .astype(np.float32) / np.sqrt(self.edge_dim))
        out = {}
        for t in np.unique(etype):
            sel = etype == t
            u_t = sgns_on(row[sel], col[sel], self.edge_dim,
                          self.seed + 1 + int(t))
            out[int(t)] = base + u_t @ proj
        return out
