"""node2vec — rebuild of reference cogdl/models/emb/node2vec.py with
rejection-sampled biased walks + device SGNS."""

from __future__ import annotations

import numpy as np

from ...data.graph import Graph
from .base import EmbeddingModel
from .walks import build_csr, node2vec_walks, train_sgns, walks_to_pairs


class Node2Vec(EmbeddingModel):
    def __init__(self, hidden_size: int = 128, walk_length: int = 40,
                 walk_num: int = 10, window_size: int = 5, iteration: int = 2,
                 negative: int = 5, p: float = 1.0, q: float = 1.0,
                 seed: int = 0, **kw):
        super().__init__(hidden_size, seed)
        self.walk_length = walk_length
        self.walk_num = walk_num
        self.window_size = window_size
        self.iteration = iteration
        self.negative = negative
        self.p = p
        self.q = q

    def train_embeddings(self, graph: Graph) -> np.ndarray:
        indptr, indices = build_csr(graph)
        walks = node2vec_walks(indptr, indices, self.walk_num,
                               self.walk_length, p=self.p, q=self.q,
                               seed=self.seed)
        pairs = walks_to_pairs(walks, self.window_size, seed=self.seed,
                               max_pairs=4_000_000)
        return train_sgns(pairs, graph.num_nodes, dim=self.hidden_size,
                          num_negative=self.negative, epochs=self.iteration,
                          seed=self.seed)
