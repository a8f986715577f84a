"""ProNE — sparse matrix factorisation + Chebyshev spectral propagation.

Rebuild of reference cogdl/models/emb/prone.py and utils/prone_utils.py.
"""

from __future__ import annotations

import numpy as np
import scipy.sparse as sp

from ...data.graph import Graph
from .base import EmbeddingModel, graph_to_scipy, top_svd


class ProNE(EmbeddingModel):
    def __init__(self, hidden_size: int = 128, step: int = 10,
                 mu: float = 0.2, theta: float = 0.5, seed: int = 0, **kw):
        super().__init__(hidden_size, seed)
        self.step = step
        self.mu = mu
        self.theta = theta

    def train_embeddings(self, graph: Graph) -> np.ndarray:
        A = graph_to_scipy(graph)
        emb = self._factorize(A)
        return self._chebyshev(A, emb)

    def _factorize(self, A: sp.csr_matrix) -> np.ndarray:
        """tf-idf-style smoothed PPMI of the 1-step transition, sparse SVD."""
        N = A.shape[0]
        deg = np.asarray(A.sum(1)).ravel()
        P = sp.diags(1.0 / np.maximum(deg, 1e-12)) @ A
        P = P.tocoo()
        vol = float(A.sum())
        # NCE-style shifted log values on the sparse support
        col_deg = np.maximum(deg[P.col], 1e-12)
        vals = np.log(np.maximum(P.data, 1e-12)) - np.log(
            1.0 * col_deg / vol)
        M = sp.csr_matrix((np.maximum(vals, 0), (P.row, P.col)), shape=(N, N))
        return top_svd(M, self.hidden_size, self.seed)

    def _chebyshev(self, A: sp.csr_matrix, emb: np.ndarray) -> np.ndarray:
        """Chebyshev–Gaussian band-pass spectral propagation (the ProNE paper's
        spectral modulation; reference utils/prone_utils.py chebyshev_gaussian):
        g(λ) = e^{-½[(λ-μ)²-1]θ} expanded in Chebyshev polynomials with
        modified-Bessel coefficients I_k(θ)."""
        from scipy.special import iv

        N = A.shape[0]
        deg = np.asarray(A.sum(1)).ravel()
        DA = sp.diags(1.0 / np.maximum(deg, 1e-12)) @ A   # row-stochastic
        L = sp.eye(N) - DA
        M = L - self.mu * sp.eye(N)
        theta = self.theta
        Lx0 = emb
        Lx1 = M @ emb
        conv = iv(0, theta) * Lx0 - 2 * iv(1, theta) * Lx1
        for k in range(2, self.step + 1):
            Lx2 = 2 * (M @ Lx1) - Lx0
            conv += ((-1) ** k) * 2 * iv(k, theta) * Lx2
            Lx0, Lx1 = Lx1, Lx2
        prop = np.asarray(A @ (emb - conv))
        # svd renormalisation
        u, s, vt = np.linalg.svd(prop, full_matrices=False)
        return (u * np.sqrt(np.maximum(s, 1e-12))) @ vt
