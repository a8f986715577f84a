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

    def _sample_pairs(self, graph: Graph) -> np.ndarray:
        rng = np.random.default_rng(self.seed)
        E = graph.num_edges
        row = np.asarray(graph.row)[:E]
        col = np.asarray(graph.col)[:E]
        w = np.asarray(graph.edge_weight)[:E].astype(np.float64)
        probs = w / w.sum()
        idx = rng.choice(E, size=min(self.num_samples, max(E * 20, E)), p=probs)
        pairs = np.stack([row[idx], col[idx]], 1)
        return np.concatenate([pairs, pairs[:, ::-1]], 0)

    def train_embeddings(self, graph: Graph) -> np.ndarray:
        """order=1: first-order proximity (tied vertex table); order=2:
        second-order (separate context table); order=3: both at dim/2,
        L2-normalised halves concatenated (reference line.py:86-108)."""
        if self.order not in (1, 2, 3):
            raise ValueError(f"LINE order must be 1, 2 or 3, got {self.order}")
        pairs = self._sample_pairs(graph)

        def run(order, dim, seed):
            e = train_sgns(pairs, graph.num_nodes, dim=dim,
                           num_negative=self.negative, epochs=self.iteration,
                           seed=seed, tie_context=(order == 1))
            n = np.linalg.norm(e, axis=1, keepdims=True)
            return e / np.maximum(n, 1e-12)

        if self.order == 1:
            return run(1, self.hidden_size, self.seed)
        if self.order == 2:
            return run(2, self.hidden_size, self.seed)
        half = max(self.hidden_size // 2, 1)
        return np.hstack([run(1, half, self.seed),
                          run(2, half, self.seed + 1)])
