"""RobustGCN — Gaussian-distribution graph convolutions for adversarial
robustness (Zhu et al., KDD'19). Rebuild of reference
examples/GRB/defense/robustgcn.py:15 (RobustGCN + RobustGCNConv) and its
``RobustGCNAdjNorm`` pair of propagation matrices
(cogdl/utils/grb_utils.py:447: adj0 = D^-1/2 (A+I) D^-1/2,
adj1 = D^-1 (A+I) D^-1).

Each layer carries a (mean, variance) pair; an attention gate ``exp(-var)``
down-weights high-variance (likely-attacked) dimensions before propagation,
and the two statistics propagate through differently normalised adjacencies.
The reference samples ``mean + ε·√var`` at every forward; here sampling
happens only in training (eval returns the mean — deterministic metrics)."""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...data.graph import Graph
from ...ops import spmm


def _dual_norm_weights(graph: Graph):
    """Edge weights of adj0/adj1 from the binary adjacency (self-loops are
    expected to be present already — the node-classification wrapper adds
    them)."""
    w = graph.edge_mask().astype(jnp.float32)
    deg = jax.ops.segment_sum(w, graph.row, graph.n_pad,
                              indices_are_sorted=True)
    d0 = jax.lax.rsqrt(jnp.maximum(deg, 1.0))
    d1 = 1.0 / jnp.maximum(deg, 1.0)
    r, c = graph.row, graph.col
    w0 = w * jnp.take(d0, r, mode="clip") * jnp.take(d0, c, mode="clip")
    w1 = w * jnp.take(d1, r, mode="clip") * jnp.take(d1, c, mode="clip")
    return w0, w1


class RobustGCNConv(nn.Module):
    out_features: int
    initial: bool = False
    dropout: float = 0.0

    @nn.compact
    def __call__(self, g0: Graph, g1: Graph, mean, var, training: bool):
        mean = nn.Dense(self.out_features, name="mean_conv")(mean)
        var = mean if self.initial else nn.Dense(self.out_features,
                                                 name="var_conv")(var)
        mean = nn.elu(mean)
        var = nn.relu(var)
        attention = jnp.exp(-var)
        mean = spmm(g0, mean * attention)
        var = spmm(g1, var * attention * attention)
        if self.dropout > 0:
            mean = nn.elu(mean)
            var = nn.relu(var)
            if training:
                drop = nn.Dropout(rate=self.dropout, deterministic=False)
                mean = drop(mean)
                var = drop(var)
        return mean, var


class RobustGCN(nn.Module):
    in_features: int
    out_features: int
    hidden_size: int = 64
    num_layers: int = 2
    dropout: float = 0.5
    adj_norm: Optional[str] = None  # computes its own dual normalisation

    @nn.compact
    def __call__(self, graph: Graph, x: Optional[jnp.ndarray] = None,
                 training: bool = False):
        if x is None:
            x = graph.x
        w0, w1 = _dual_norm_weights(graph)
        g0 = graph.replace(edge_weight=w0).with_meta(norm="robust0")
        g1 = graph.replace(edge_weight=w1).with_meta(norm="robust1")
        mean, var = x, x
        for i in range(self.num_layers):
            last = i == self.num_layers - 1
            mean, var = RobustGCNConv(
                self.out_features if last else self.hidden_size,
                initial=(i == 0),
                dropout=0.0 if last else self.dropout,
                name=f"layer{i}")(g0, g1, mean, var, training)
        if training:
            eps = jax.random.normal(self.make_rng("dropout"), var.shape)
            # +1e-8: d√v/dv → ∞ at v = 0, and relu'd variances ARE exactly 0
            return mean + eps * jnp.sqrt(jnp.maximum(var, 0.0) + 1e-8)
        return mean
