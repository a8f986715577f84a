"""GRACE: contrastive learning with two graph views (edge drop + feature mask).

Rebuild of reference cogdl/models/nn/grace.py + grace_mw. TPU-first note:
edge dropping is a *weight* mask (static shapes preserved), not edge removal.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...data.graph import Graph, sym_norm
from ...layers import GCNLayer


class GRACE(nn.Module):
    in_features: int
    out_features: int = 0  # unused (self-supervised)
    hidden_size: int = 128
    proj_size: int = 128
    num_layers: int = 2
    tau: float = 0.4
    drop_edge_rates: tuple = (0.2, 0.4)
    drop_feature_rates: tuple = (0.3, 0.4)

    def setup(self):
        self.convs = [GCNLayer(self.hidden_size, activation="relu",
                               name=f"conv{i}")
                      for i in range(self.num_layers)]
        self.proj1 = nn.Dense(self.proj_size, name="proj1")
        self.proj2 = nn.Dense(self.proj_size, name="proj2")

    def encode(self, graph: Graph, x: jnp.ndarray, training: bool = False):
        g = sym_norm(graph)
        h = x
        for conv in self.convs:
            h = conv(g, h, training)
        return h

    def __call__(self, graph: Graph, x: Optional[jnp.ndarray] = None,
                 training: bool = False):
        if x is None:
            x = graph.x
        return self.encode(graph, x, training)

    def view(self, graph: Graph, x: jnp.ndarray, rng, view_idx: int,
             training: bool = True):
        """Augmented-view embedding: drop edges (weight mask) + mask features."""
        r1, r2 = jax.random.split(rng)
        de = self.drop_edge_rates[view_idx]
        df = self.drop_feature_rates[view_idx]
        ew = graph.edge_weight * jax.random.bernoulli(
            r1, 1.0 - de, graph.edge_weight.shape).astype(graph.edge_weight.dtype)
        feat_mask = jax.random.bernoulli(r2, 1.0 - df, (1, x.shape[1]))
        g = graph.replace(edge_weight=ew)
        # edge weights changed → re-normalise (tag dropped via replace? meta
        # preserved; force renorm by clearing tag)
        g = g.replace(meta=tuple((k, v) for k, v in g.meta if k != "norm"))
        return self.encode(g, x * feat_mask, training)

    def project(self, h: jnp.ndarray):
        return self.proj2(jax.nn.elu(self.proj1(h)))

    def nt_xent(self, z1: jnp.ndarray, z2: jnp.ndarray, mask: jnp.ndarray):
        """Normalised-temperature cross entropy over node pairs."""
        # sqrt(x+eps) keeps gradients finite on all-zero (pad) rows, where
        # linalg.norm's vjp emits 0 * inf = NaN
        z1 = z1 * jax.lax.rsqrt(jnp.sum(z1 ** 2, 1, keepdims=True) + 1e-12)
        z2 = z2 * jax.lax.rsqrt(jnp.sum(z2 ** 2, 1, keepdims=True) + 1e-12)
        m = mask.astype(z1.dtype)
        sim11 = jnp.exp(z1 @ z1.T / self.tau) * m[None, :]
        sim12 = jnp.exp(z1 @ z2.T / self.tau) * m[None, :]
        pos = jnp.diag(sim12)
        diag11 = jnp.diag(sim11)
        denom = sim11.sum(1) - diag11 + sim12.sum(1)
        loss = -jnp.log(jnp.maximum(pos, 1e-12) / jnp.maximum(denom, 1e-12))
        return jnp.sum(loss * m) / jnp.maximum(m.sum(), 1.0)
