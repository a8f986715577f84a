"""Hin2vec — heterogeneous embeddings with learned metapath (relation)
vectors: walks emit (u, v, path-type) triples, trained with a Hadamard
relation scorer (reference cogdl/models/emb/hin2vec.py — torch MLP there,
jitted scorer here)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ...data.graph import Graph
from .base import EmbeddingModel
from .walks import build_csr, random_walks


class Hin2Vec(EmbeddingModel):
    def __init__(self, hidden_size: int = 128, walk_length: int = 20,
                 walk_num: int = 5, window_size: int = 3, negative: int = 4,
                 epochs: int = 2, lr: float = 0.01, batch_size: int = 4096,
                 seed: int = 0, **kw):
        super().__init__(hidden_size, seed)
        self.walk_length = walk_length
        self.walk_num = walk_num
        self.window_size = window_size
        self.negative = negative
        self.epochs = epochs
        self.lr = lr
        self.batch_size = batch_size

    def train_embeddings(self, graph: Graph) -> np.ndarray:
        rng = np.random.default_rng(self.seed)
        indptr, indices = build_csr(graph)
        node_type = (np.asarray(graph.extras["node_type"])[: graph.num_nodes]
                     if graph.extras and "node_type" in graph.extras
                     else np.zeros(graph.num_nodes, np.int64))
        T = int(node_type.max()) + 1
        walks = random_walks(indptr, indices, self.walk_num, self.walk_length,
                             seed=self.seed)
        # pairs with path type = (type(u), type(v), hop) id
        pairs, ptypes = [], []
        for off in range(1, self.window_size + 1):
            u = walks[:, :-off].ravel()
            v = walks[:, off:].ravel()
            pairs.append(np.stack([u, v], 1))
            ptypes.append(node_type[u] * T * self.window_size
                          + node_type[v] * self.window_size + (off - 1))
        P = np.concatenate(pairs, 0)
        R = np.concatenate(ptypes, 0)
        num_rel = T * T * self.window_size
        N = graph.num_nodes
        key = jax.random.PRNGKey(self.seed)
        params = {
            "node": jax.random.normal(key, (N, self.hidden_size)) * 0.1,
            "rel": jnp.zeros((num_rel, self.hidden_size)),
        }
        tx = optax.adam(self.lr)
        opt = tx.init(params)
        B = self.batch_size

        @jax.jit
        def step(params, opt, u, v, r, vneg):
            def loss_fn(p):
                rel = jax.nn.sigmoid(p["rel"][r])
                pos = jnp.sum(p["node"][u] * p["node"][v] * rel, -1)
                neg = jnp.einsum("bd,bkd->bk", p["node"][u] * rel,
                                 p["node"][vneg])
                return -(jnp.mean(jax.nn.log_sigmoid(pos))
                         + jnp.mean(jax.nn.log_sigmoid(-neg)))

            loss, grads = jax.value_and_grad(loss_fn)(params)
            upd, opt2 = tx.update(grads, opt, params)
            return optax.apply_updates(params, upd), opt2, loss

        n = P.shape[0]
        for _ in range(self.epochs):
            perm = rng.permutation(n)
            for b in range(max(n // B, 1)):
                sl = perm[b * B: (b + 1) * B]
                if sl.shape[0] < B:
                    sl = np.concatenate([sl, perm[: B - sl.shape[0]]])
                vneg = rng.integers(0, N, (B, self.negative))
                params, opt, _ = step(params, opt,
                                      jnp.asarray(P[sl, 0]),
                                      jnp.asarray(P[sl, 1]),
                                      jnp.asarray(R[sl]),
                                      jnp.asarray(vneg))
        return np.asarray(params["node"])
