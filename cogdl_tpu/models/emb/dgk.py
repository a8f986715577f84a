"""Deep Graph Kernel — graphlet/WL-substructure co-occurrence embeddings
(reference cogdl/models/emb/dgk.py). WL-feature documents per graph, with a
learned substructure similarity (SGNS over co-occurring features)."""

from __future__ import annotations

from typing import List

import numpy as np

from ...data.graph import Graph
from .base import EmbeddingModel
from .graph2vec import wl_features


class DeepGraphKernel(EmbeddingModel):
    def __init__(self, hidden_size: int = 128, wl_iterations: int = 2,
                 dim_buckets: int = 1024, seed: int = 0, **kw):
        super().__init__(hidden_size, seed)
        self.wl_iterations = wl_iterations
        self.dim_buckets = dim_buckets

    def train_graph_embeddings(self, graphs: List[Graph]) -> np.ndarray:
        D = self.dim_buckets
        counts = np.zeros((len(graphs), D), np.float32)
        for i, g in enumerate(graphs):
            for f in wl_features(g, self.wl_iterations):
                counts[i, f % D] += 1.0
        # substructure similarity M = co-occurrence PMI between features
        C = counts.T @ counts                      # [D, D]
        tot = np.maximum(C.sum(), 1.0)
        pi = np.maximum(C.sum(1), 1.0)
        M = np.log(np.maximum(C * tot / np.outer(pi, pi), 1.0))
        # graph kernel features: counts weighted through the similarity
        K = counts @ M                             # [G, D]
        from .base import top_svd

        k = min(self.hidden_size, min(K.shape) - 1)
        return top_svd(K, max(k, 2), self.seed)
