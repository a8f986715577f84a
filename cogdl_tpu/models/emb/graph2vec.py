"""graph2vec — whole-graph embeddings via WL-subtree "documents" + doc-level
SGNS (reference cogdl/models/emb/graph2vec.py uses gensim Doc2Vec; here:
WL relabeling → hashed feature counts → TF-IDF-ish vectors + SVD)."""

from __future__ import annotations

from typing import List

import numpy as np

from ...data.graph import Graph
from .base import EmbeddingModel


def wl_features(graph: Graph, iterations: int = 3) -> List[int]:
    """Weisfeiler-Lehman subtree hashes of one graph."""
    E, N = graph.num_edges, graph.num_nodes
    row = np.asarray(graph.row)[:E]
    col = np.asarray(graph.col)[:E]
    x = None if graph.x is None else np.asarray(graph.x)[:N]
    if x is not None and x.ndim > 1 and np.all((x == 0) | (x == 1)):
        labels = np.argmax(x, 1).astype(np.int64)  # categorical one-hot
    else:
        labels = np.bincount(row, minlength=N).astype(np.int64)  # degrees
    feats = list(labels.tolist())
    for _ in range(iterations):
        new = np.empty(N, np.int64)
        for v in range(N):
            nbr = labels[col[row == v]]
            sig = (int(labels[v]),) + tuple(sorted(nbr.tolist()))
            new[v] = hash(sig) % (2 ** 31)
        labels = new
        feats.extend(labels.tolist())
    return feats


class Graph2Vec(EmbeddingModel):
    def __init__(self, hidden_size: int = 128, wl_iterations: int = 3,
                 dim_buckets: int = 2048, seed: int = 0, **kw):
        super().__init__(hidden_size, seed)
        self.wl_iterations = wl_iterations
        self.dim_buckets = dim_buckets

    def train_graph_embeddings(self, graphs: List[Graph]) -> np.ndarray:
        counts = np.zeros((len(graphs), self.dim_buckets), np.float32)
        for i, g in enumerate(graphs):
            for f in wl_features(g, self.wl_iterations):
                counts[i, f % self.dim_buckets] += 1.0
        # tf-idf weighting then SVD to hidden_size
        df = np.maximum((counts > 0).sum(0), 1)
        tfidf = counts * np.log(len(graphs) / df)[None, :]
        from .base import top_svd

        k = min(self.hidden_size, min(tfidf.shape) - 1)
        return top_svd(tfidf, max(k, 2), self.seed)
