"""DNGR — random-surfing PPMI + (denoising) autoencoder
(reference cogdl/models/emb/dngr.py)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ...data.graph import Graph
from .base import EmbeddingModel, graph_to_scipy
from .sdne import _AE


class DNGR(EmbeddingModel):
    def __init__(self, hidden_size: int = 128, enc_hidden: int = 256,
                 step: int = 5, alpha: float = 0.98, epochs: int = 200,
                 lr: float = 1e-3, noise: float = 0.2, seed: int = 0, **kw):
        super().__init__(hidden_size, seed)
        self.enc_hidden = enc_hidden
        self.step = step
        self.alpha = alpha
        self.epochs = epochs
        self.lr = lr
        self.noise = noise

    def _ppmi(self, graph: Graph) -> np.ndarray:
        A = np.asarray(graph_to_scipy(graph).todense(), np.float64)
        N = A.shape[0]
        P = A / np.maximum(A.sum(1, keepdims=True), 1e-12)
        M = np.zeros_like(P)
        cur = np.eye(N)
        for _ in range(self.step):
            cur = self.alpha * (cur @ P) + (1 - self.alpha) * np.eye(N)
            M += cur
        col = M.sum(0, keepdims=True)
        row = M.sum(1, keepdims=True)
        pmi = np.log(np.maximum(M * M.sum() / np.maximum(row @ col, 1e-12),
                                1.0))
        return pmi.astype(np.float32)

    def train_embeddings(self, graph: Graph) -> np.ndarray:
        import optax

        X = jnp.asarray(self._ppmi(graph))
        N = X.shape[0]
        model = _AE(self.enc_hidden, self.hidden_size)
        key = jax.random.PRNGKey(self.seed)
        params = model.init(key, jnp.zeros((2, N)))
        tx = optax.adam(self.lr)
        opt = tx.init(params)

        @jax.jit
        def step(params, opt, k):
            def loss_fn(p):
                keep = jax.random.bernoulli(k, 1 - self.noise, X.shape)
                _, rec = model.apply(p, X * keep)
                return jnp.mean((rec - X) ** 2)

            loss, grads = jax.value_and_grad(loss_fn)(params)
            upd, opt2 = tx.update(grads, opt, params)
            return optax.apply_updates(params, upd), opt2, loss

        for i in range(self.epochs):
            key, k = jax.random.split(key)
            params, opt, _ = step(params, opt, k)
        z, _ = model.apply(params, X)
        return np.asarray(z)
