"""ProNE++ — AutoML-selected ensemble of spectral filters over a base
embedding (reference cogdl/models/emb/prone.py ProNE++ variant: searches
filter combinations, picks the best by downstream probe)."""

from __future__ import annotations

from typing import List

import numpy as np
import scipy.sparse as sp

from ...data.graph import Graph
from .base import EmbeddingModel, graph_to_scipy
from .prone import ProNE


class ProNEpp(EmbeddingModel):
    def __init__(self, hidden_size: int = 128, max_evals: int = 6,
                 seed: int = 0, **kw):
        super().__init__(hidden_size, seed)
        self.max_evals = max_evals

    def train_embeddings(self, graph: Graph) -> np.ndarray:
        rng = np.random.default_rng(self.seed)
        base = ProNE(self.hidden_size, seed=self.seed)
        emb0 = base._factorize(graph_to_scipy(graph))
        A = graph_to_scipy(graph)
        best_emb, best_score = emb0, -np.inf
        y = None if graph.y is None else np.asarray(graph.y)[: graph.num_nodes]
        for _ in range(self.max_evals):
            mu = float(rng.uniform(0.0, 0.5))
            theta = float(rng.uniform(0.2, 1.5))
            p = ProNE(self.hidden_size, mu=mu, theta=theta, seed=self.seed)
            emb = p._chebyshev(A, emb0)
            score = self._probe(emb, y, rng)
            if score > best_score:
                best_emb, best_score = emb, score
        return best_emb

    def _probe(self, emb, y, rng) -> float:
        if y is None or y.ndim != 1:
            # unsupervised proxy: neighborhood smoothness
            return -float(np.var(emb))
        from sklearn.linear_model import LogisticRegression
        from sklearn.model_selection import cross_val_score

        emb = (emb - emb.mean(0)) / np.maximum(emb.std(0), 1e-8)
        try:
            return float(np.mean(cross_val_score(
                LogisticRegression(max_iter=200), emb[: y.shape[0]], y, cv=3)))
        except ValueError:
            return -np.inf
