"""GCNMix — MixMatch-style semi-supervised GCN: manifold mixup of hidden
states with matching LABEL mixing (reference cogdl/models/nn/gcnmix.py).
``mixup_forward`` returns (logits, perm, lam) so the GCNMix wrapper can mix
the targets too — mixing only the features against unmixed labels trains the
wrong objective."""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...data.graph import Graph, sym_norm
from ...layers import GCNLayer


class GCNMix(nn.Module):
    in_features: int
    out_features: int
    hidden_size: int = 64
    dropout: float = 0.5
    alpha: float = 1.0          # beta-distribution mixup strength
    temperature: float = 0.1

    @nn.compact
    def __call__(self, graph: Graph, x: Optional[jnp.ndarray] = None,
                 training: bool = False):
        if x is None:
            x = graph.x
        g = sym_norm(graph)
        h = GCNLayer(self.hidden_size, dropout=self.dropout,
                     activation="relu", name="gcn1")(g, x, training)
        return GCNLayer(self.out_features, name="gcn2")(g, h, training)

    @nn.compact
    def mixup_forward(self, graph: Graph, x, training: bool = True):
        """Manifold-mixup forward: returns (logits, perm, lam); the wrapper
        mixes the LABELS with the same (perm, lam)."""
        g = sym_norm(graph)
        h = GCNLayer(self.hidden_size, dropout=self.dropout,
                     activation="relu", name="gcn1")(g, x, training)
        rng = self.make_rng("dropout")
        lam = jax.random.beta(rng, self.alpha, self.alpha)
        lam = jnp.maximum(lam, 1 - lam)
        n = graph.num_nodes
        # permute REAL nodes only (pad rows are zeros)
        perm = jnp.concatenate([
            jax.random.permutation(jax.random.fold_in(rng, 1), n),
            jnp.arange(n, h.shape[0])])
        h = lam * h + (1 - lam) * h[perm]
        logits = GCNLayer(self.out_features, name="gcn2")(g, h, training)
        return logits, perm, lam

    def sharpen(self, probs: jnp.ndarray) -> jnp.ndarray:
        p = probs ** (1.0 / self.temperature)
        return p / jnp.maximum(p.sum(-1, keepdims=True), 1e-12)
