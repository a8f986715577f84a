"""GraRep — k-step transition-probability log factorisation
(reference cogdl/models/emb/grarep.py)."""

from __future__ import annotations

import numpy as np
import scipy.sparse as sp

from ...data.graph import Graph
from .base import EmbeddingModel, graph_to_scipy, top_svd


class GraRep(EmbeddingModel):
    def __init__(self, hidden_size: int = 128, step: int = 4, seed: int = 0,
                 **kw):
        super().__init__(hidden_size, seed)
        self.step = step

    def train_embeddings(self, graph: Graph) -> np.ndarray:
        A = graph_to_scipy(graph)
        deg = np.asarray(A.sum(1)).ravel()
        P = sp.diags(1.0 / np.maximum(deg, 1e-12)) @ A
        per = max(self.hidden_size // self.step, 8)
        embs = []
        Pk = sp.eye(A.shape[0], format="csr")
        for _ in range(self.step):
            Pk = (Pk @ P).tocsr()
            M = Pk.copy()
            M.data = np.log(np.maximum(M.data, 1e-12)) - np.log(
                1.0 / max(A.shape[0], 1))
            M.data = np.maximum(M.data, 0)
            embs.append(top_svd(M, per, self.seed))
        return np.concatenate(embs, axis=1).astype(np.float32)
