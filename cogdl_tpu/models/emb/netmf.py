"""NetMF — closed-form DeepWalk matrix factorisation.

Rebuild of reference cogdl/models/emb/netmf.py: M = vol/(b·T) Σ_t (D⁻¹A)^t D⁻¹,
embedding = SVD(log⁺ M).
"""

from __future__ import annotations

import numpy as np
import scipy.sparse as sp

from ...data.graph import Graph
from .base import EmbeddingModel, graph_to_scipy, top_svd


class NetMF(EmbeddingModel):
    def __init__(self, hidden_size: int = 128, window_size: int = 5,
                 negative: int = 1, is_large: bool = False, rank: int = 256,
                 seed: int = 0, **kw):
        super().__init__(hidden_size, seed)
        self.window_size = window_size
        self.negative = negative
        self.is_large = is_large
        self.rank = rank

    def train_embeddings(self, graph: Graph) -> np.ndarray:
        A = graph_to_scipy(graph)
        vol = float(A.sum())
        d = np.asarray(A.sum(1)).ravel()
        d_inv = 1.0 / np.maximum(d, 1e-12)
        P = sp.diags(d_inv) @ A            # D^-1 A
        N = A.shape[0]
        if self.is_large or N > 20000:
            return self._large(A, P, d_inv, vol)
        Pd = P.toarray()
        S = np.zeros_like(Pd)
        Pt = np.eye(N)
        for _ in range(self.window_size):
            Pt = Pt @ Pd
            S += Pt
        M = (vol / (self.negative * self.window_size)) * S * d_inv[None, :]
        logM = np.log(np.maximum(M, 1.0))
        return top_svd(logM, self.hidden_size, self.seed)

    def _large(self, A, P, d_inv, vol):
        """Eigen-approximation variant (reference netmf large path)."""
        from scipy.sparse.linalg import eigsh

        N = A.shape[0]
        d_sqrt_inv = np.sqrt(d_inv)
        Dn = sp.diags(d_sqrt_inv)
        L = Dn @ A @ Dn
        k = min(self.rank, N - 2)
        vals, vecs = eigsh(L, k=k)
        vals = np.clip(vals, -1.0, 1.0)
        # filter: (1/T) sum_t vals^t
        filt = vals.copy()
        acc = vals.copy()
        for _ in range(self.window_size - 1):
            acc = acc * vals
            filt += acc
        filt /= self.window_size
        filt = np.maximum(filt, 0.0)
        U = Dn @ vecs * np.sqrt(np.maximum(filt, 0))[None, :]
        M = (vol / self.negative) * (U @ U.T)
        logM = np.log(np.maximum(M, 1.0))
        return top_svd(logM, self.hidden_size, self.seed)
