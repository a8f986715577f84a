"""PTE — predictive text embedding over heterogeneous bipartite graphs:
LINE-style edge-sampled SGNS per relation type, shared node embeddings
(reference cogdl/models/emb/pte.py)."""

from __future__ import annotations

import numpy as np

from ...data.graph import Graph
from .base import EmbeddingModel
from .walks import train_sgns


class PTE(EmbeddingModel):
    def __init__(self, hidden_size: int = 128, num_samples: int = 1_000_000,
                 negative: int = 5, iteration: int = 3, seed: int = 0, **kw):
        super().__init__(hidden_size, seed)
        self.num_samples = num_samples
        self.negative = negative
        self.iteration = iteration

    def train_embeddings(self, graph: Graph) -> np.ndarray:
        rng = np.random.default_rng(self.seed)
        E = graph.num_edges
        row = np.asarray(graph.row)[:E]
        col = np.asarray(graph.col)[:E]
        w = np.asarray(graph.edge_weight)[:E].astype(np.float64)
        etype = (np.asarray(graph.edge_type)[:E]
                 if graph.edge_type is not None else np.zeros(E, np.int64))
        pairs = []
        per_type = self.num_samples // max(int(etype.max()) + 1, 1)
        for t in np.unique(etype):
            sel = etype == t
            probs = w[sel] / w[sel].sum()
            idx = rng.choice(np.nonzero(sel)[0], size=per_type, p=probs)
            pairs.append(np.stack([row[idx], col[idx]], 1))
        P = np.concatenate(pairs + [p[:, ::-1] for p in pairs], 0)
        return train_sgns(P, graph.num_nodes, dim=self.hidden_size,
                          num_negative=self.negative, epochs=self.iteration,
                          seed=self.seed)
