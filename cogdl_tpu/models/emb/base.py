"""Shallow-embedding model base.

Interface: ``train_embeddings(graph) -> np.ndarray [num_nodes, dim]``.
These models run on host (scipy/numpy) with jit-compiled SGNS training on
device where applicable — the rebuild of cogdl/models/emb/* (23 files).
"""

from __future__ import annotations

import numpy as np
import scipy.sparse as sp

from ...data.graph import Graph


def graph_to_scipy(graph: Graph, directed: bool = False) -> sp.csr_matrix:
    """Real-edge adjacency as scipy CSR (reference Adjacency.to_scipy,
    data.py:411)."""
    E, N = graph.num_edges, graph.num_nodes
    row = np.asarray(graph.row)[:E]
    col = np.asarray(graph.col)[:E]
    w = np.asarray(graph.edge_weight)[:E]
    A = sp.csr_matrix((w, (row, col)), shape=(N, N))
    if not directed:
        A = A.maximum(A.T)
    return A


class EmbeddingModel:
    def __init__(self, hidden_size: int = 128, seed: int = 0, **kw):
        self.hidden_size = hidden_size
        self.seed = seed

    def train_embeddings(self, graph: Graph) -> np.ndarray:
        raise NotImplementedError


def top_svd(M, dim: int, seed: int = 0) -> np.ndarray:
    """Randomized truncated SVD embedding U·√Σ (used by NetMF/HOPE/GraRep)."""
    from sklearn.decomposition import TruncatedSVD

    svd = TruncatedSVD(n_components=dim, random_state=seed)
    U = svd.fit_transform(M)  # = U * Sigma
    # scale to U * sqrt(Sigma)
    sigma = svd.singular_values_
    return U / np.sqrt(np.maximum(sigma, 1e-12))
