"""DeepWalk — rebuild of reference cogdl/models/emb/deepwalk.py:11 with the
numpy walker + device SGNS instead of networkx + gensim."""

from __future__ import annotations

import numpy as np

from ...data.graph import Graph
from .base import EmbeddingModel
from .walks import build_csr, random_walks, train_sgns, walks_to_pairs


class DeepWalk(EmbeddingModel):
    def __init__(self, hidden_size: int = 128, walk_length: int = 40,
                 walk_num: int = 10, window_size: int = 5, iteration: int = 2,
                 negative: int = 5, seed: int = 0, **kw):
        super().__init__(hidden_size, seed)
        self.walk_length = walk_length
        self.walk_num = walk_num
        self.window_size = window_size
        self.iteration = iteration
        self.negative = negative

    def _walks(self, graph: Graph) -> np.ndarray:
        indptr, indices = build_csr(graph)
        return random_walks(indptr, indices, self.walk_num, self.walk_length,
                            seed=self.seed)

    def train_embeddings(self, graph: Graph) -> np.ndarray:
        walks = self._walks(graph)
        pairs = walks_to_pairs(walks, self.window_size, seed=self.seed,
                               max_pairs=4_000_000)
        return train_sgns(pairs, graph.num_nodes, dim=self.hidden_size,
                          num_negative=self.negative, epochs=self.iteration,
                          seed=self.seed)
