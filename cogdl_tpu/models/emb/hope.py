"""HOPE — Katz-proximity SVD embedding (reference cogdl/models/emb/hope.py)."""

from __future__ import annotations

import numpy as np
import scipy.sparse as sp

from ...data.graph import Graph
from .base import EmbeddingModel, graph_to_scipy


class HOPE(EmbeddingModel):
    def __init__(self, hidden_size: int = 128, beta: float = 0.01,
                 seed: int = 0, **kw):
        super().__init__(hidden_size, seed)
        self.beta = beta

    def train_embeddings(self, graph: Graph) -> np.ndarray:
        from scipy.sparse.linalg import svds

        A = graph_to_scipy(graph, directed=True)
        N = A.shape[0]
        # Katz: S = (I - βA)^-1 βA ; computed via sparse solve-free expansion
        katz = self.beta * A
        term = katz.copy()
        for _ in range(8):
            term = self.beta * (A @ term)
            katz = katz + term
        k = min(self.hidden_size // 2, N - 2)
        u, s, vt = svds(katz.tocsc().astype(np.float64), k=k)
        sq = np.sqrt(np.maximum(s, 0))
        src = u * sq[None, :]
        dst = vt.T * sq[None, :]
        return np.concatenate([src, dst], axis=1).astype(np.float32)
