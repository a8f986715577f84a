"""NetSMF — sparse DeepWalk-matrix approximation via path sampling
(reference cogdl/models/emb/netsmf.py, C++-threaded there; vectorised numpy
here): sample random-walk paths to build a sparse log-PMI matrix, then SVD."""

from __future__ import annotations

import numpy as np
import scipy.sparse as sp

from ...data.graph import Graph
from .base import EmbeddingModel, graph_to_scipy, top_svd
from .walks import build_csr


class NetSMF(EmbeddingModel):
    def __init__(self, hidden_size: int = 128, window_size: int = 5,
                 num_rounds: int = 100, negative: int = 1, seed: int = 0, **kw):
        super().__init__(hidden_size, seed)
        self.window_size = window_size
        self.num_rounds = num_rounds
        self.negative = negative

    def train_embeddings(self, graph: Graph) -> np.ndarray:
        rng = np.random.default_rng(self.seed)
        indptr, indices = build_csr(graph)
        N = graph.num_nodes
        true_deg = np.diff(indptr)
        deg = np.maximum(true_deg, 1)
        E = indices.shape[0]
        vol = float(E)
        rows, cols = [], []
        # path sampling: for each round, start from every edge, walk ≤ window
        for _ in range(self.num_rounds):
            # sample one (u, r-step) pair per node for sparsity ~ N per round
            u = rng.integers(0, N, N)
            r = rng.integers(1, self.window_size + 1, N)
            cur = u.copy()
            for step in range(self.window_size):
                active = step < r
                d = deg[cur]
                off = (rng.random(N) * d).astype(np.int64)
                # clipped gather: trailing isolated nodes have
                # indptr[cur] == len(indices)
                pos = np.minimum(indptr[cur] + np.minimum(off, d - 1),
                                 max(indices.shape[0] - 1, 0))
                nxt = indices[pos] if indices.size else cur
                cur = np.where(active & (true_deg[cur] > 0), nxt, cur)
            rows.append(u)
            cols.append(cur)
        r_idx = np.concatenate(rows)
        c_idx = np.concatenate(cols)
        M = sp.csr_matrix((np.ones(r_idx.shape[0], np.float32),
                           (r_idx, c_idx)), shape=(N, N))
        M = M + M.T
        # log PMI scaling
        M = M.tocoo()
        vals = (M.data * vol) / (self.num_rounds * 2 * self.negative
                                 * deg[M.row] * deg[M.col])
        vals = np.log(np.maximum(vals, 1.0))
        Ms = sp.csr_matrix((vals, (M.row, M.col)), shape=(N, N))
        return top_svd(Ms, self.hidden_size, self.seed)
