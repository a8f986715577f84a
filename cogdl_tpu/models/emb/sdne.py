"""SDNE — deep autoencoder on adjacency rows with first-order Laplacian
regulariser (reference cogdl/models/emb/sdne.py, torch there, flax here)."""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import optax

from ...data.graph import Graph
from .base import EmbeddingModel, graph_to_scipy


class _AE(nn.Module):
    hidden: int
    emb: int

    @nn.compact
    def __call__(self, a_rows):
        h = nn.relu(nn.Dense(self.hidden, name="enc1")(a_rows))
        z = nn.relu(nn.Dense(self.emb, name="enc2")(h))
        h2 = nn.relu(nn.Dense(self.hidden, name="dec1")(z))
        rec = nn.Dense(a_rows.shape[-1], name="dec2")(h2)
        return z, rec


class SDNE(EmbeddingModel):
    def __init__(self, hidden_size: int = 128, enc_hidden: int = 256,
                 alpha: float = 0.1, beta: float = 5.0, epochs: int = 200,
                 lr: float = 1e-3, seed: int = 0, **kw):
        super().__init__(hidden_size, seed)
        self.enc_hidden = enc_hidden
        self.alpha = alpha
        self.beta = beta
        self.epochs = epochs
        self.lr = lr

    def train_embeddings(self, graph: Graph) -> np.ndarray:
        A = np.asarray(graph_to_scipy(graph).todense(), np.float32)
        N = A.shape[0]
        model = _AE(self.enc_hidden, self.hidden_size)
        params = model.init(jax.random.PRNGKey(self.seed), jnp.zeros((2, N)))
        tx = optax.adam(self.lr)
        opt = tx.init(params)
        Aj = jnp.asarray(A)

        @jax.jit
        def step(params, opt):
            def loss_fn(p):
                z, rec = model.apply(p, Aj)
                b = jnp.where(Aj > 0, self.beta, 1.0)
                l2nd = jnp.mean(((rec - Aj) * b) ** 2)
                # 1st order: connected nodes close in embedding
                deg = Aj.sum(1)
                lap = (jnp.sum(z * (deg[:, None] * z))
                       - jnp.sum((Aj @ z) * z)) / N
                return l2nd + self.alpha * 2.0 * lap / max(N, 1)

            loss, grads = jax.value_and_grad(loss_fn)(params)
            upd, opt2 = tx.update(grads, opt, params)
            return optax.apply_updates(params, upd), opt2, loss

        for _ in range(self.epochs):
            params, opt, loss = step(params, opt)
        z, _ = model.apply(params, Aj)
        return np.asarray(z)
