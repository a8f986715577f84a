"""metapath2vec — metapath-guided walks on heterogeneous graphs + SGNS
(reference cogdl/models/emb/metapath2vec.py). Node types come from
``graph.extras['node_type']``; the schema is a cyclic type sequence."""

from __future__ import annotations

from typing import Sequence

import numpy as np

from ...data.graph import Graph
from .base import EmbeddingModel
from .walks import build_csr, train_sgns, walks_to_pairs


class Metapath2Vec(EmbeddingModel):
    def __init__(self, hidden_size: int = 128, walk_length: int = 20,
                 walk_num: int = 10, window_size: int = 5, iteration: int = 2,
                 negative: int = 5, schema: str = "0-1-0", seed: int = 0, **kw):
        super().__init__(hidden_size, seed)
        self.walk_length = walk_length
        self.walk_num = walk_num
        self.window_size = window_size
        self.iteration = iteration
        self.negative = negative
        self.schema = [int(s) for s in schema.split("-")]

    def metapath_walks(self, graph: Graph) -> np.ndarray:
        rng = np.random.default_rng(self.seed)
        indptr, indices = build_csr(graph)
        node_type = (np.asarray(graph.extras["node_type"])[: graph.num_nodes]
                     if graph.extras and "node_type" in graph.extras
                     else np.zeros(graph.num_nodes, np.int64))
        N = graph.num_nodes
        starts = np.tile(np.nonzero(node_type == self.schema[0])[0]
                         if (node_type == self.schema[0]).any()
                         else np.arange(N), self.walk_num)
        L = len(self.schema)
        walks = np.empty((starts.shape[0], self.walk_length), np.int64)
        walks[:, 0] = starts
        cur = starts.copy()
        for t in range(1, self.walk_length):
            want = self.schema[t % L]
            nxt = cur.copy()
            for i, v in enumerate(cur):
                nbrs = indices[indptr[v]: indptr[v + 1]]
                typed = nbrs[node_type[nbrs] == want]
                pool = typed if typed.size else nbrs
                if pool.size:
                    nxt[i] = pool[rng.integers(0, pool.size)]
            walks[:, t] = nxt
            cur = nxt
        return walks

    def train_embeddings(self, graph: Graph) -> np.ndarray:
        walks = self.metapath_walks(graph)
        pairs = walks_to_pairs(walks, self.window_size, seed=self.seed,
                               max_pairs=2_000_000)
        return train_sgns(pairs, graph.num_nodes, dim=self.hidden_size,
                          num_negative=self.negative, epochs=self.iteration,
                          seed=self.seed)
