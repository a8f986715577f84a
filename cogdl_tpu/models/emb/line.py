"""LINE — 1st/2nd-order proximity with edge-sampled SGNS
(reference cogdl/models/emb/line.py), trained with the shared jitted SGNS."""

from __future__ import annotations

import numpy as np

from ...data.graph import Graph
from .base import EmbeddingModel
from .walks import train_sgns


class LINE(EmbeddingModel):
    def __init__(self, hidden_size: int = 128, order: int = 2,
                 num_samples: int = 2_000_000, negative: int = 5,
                 iteration: int = 4, seed: int = 0, **kw):
        super().__init__(hidden_size, seed)
        self.order = order
        self.num_samples = num_samples
        self.negative = negative
        self.iteration = iteration

    def train_embeddings(self, graph: Graph) -> np.ndarray:
        rng = np.random.default_rng(self.seed)
        E = graph.num_edges
        row = np.asarray(graph.row)[:E]
        col = np.asarray(graph.col)[:E]
        w = np.asarray(graph.edge_weight)[:E].astype(np.float64)
        probs = w / w.sum()
        idx = rng.choice(E, size=min(self.num_samples, max(E * 20, E)), p=probs)
        pairs = np.stack([row[idx], col[idx]], 1)
        pairs = np.concatenate([pairs, pairs[:, ::-1]], 0)
        return train_sgns(pairs, graph.num_nodes, dim=self.hidden_size,
                          num_negative=self.negative, epochs=self.iteration,
                          seed=self.seed)
