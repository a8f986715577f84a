"""Spectral embedding — normalised-Laplacian eigenvectors
(reference cogdl/models/emb/spectral.py)."""

from __future__ import annotations

import numpy as np
import scipy.sparse as sp

from ...data.graph import Graph
from .base import EmbeddingModel, graph_to_scipy


class Spectral(EmbeddingModel):
    def train_embeddings(self, graph: Graph) -> np.ndarray:
        from scipy.sparse.linalg import eigsh

        A = graph_to_scipy(graph)
        N = A.shape[0]
        deg = np.asarray(A.sum(1)).ravel()
        Dn = sp.diags(1.0 / np.sqrt(np.maximum(deg, 1e-12)))
        L = sp.eye(N) - Dn @ A @ Dn
        k = min(self.hidden_size, N - 2)
        vals, vecs = eigsh(L, k=k, sigma=0, which="LM")
        return vecs.astype(np.float32)
