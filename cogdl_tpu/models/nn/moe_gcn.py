"""MoE-GCN — GCN blocks with a mixture-of-experts FFN.

Rebuild of reference cogdl/models/nn/moe_gcn.py (which wraps FastMoE's
FMoETransformerMLP, moe_gcn.py:9-28). TPU-first: experts are a batched
weight tensor; tokens are routed top-1 with capacity, dispatched by one-hot
matmuls (einsum) — under shard_map the expert axis maps onto the mesh, which
is the native TPU expert-parallel story (no NCCL/FastMoE machinery).
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...data.graph import Graph, sym_norm
from ...layers import GCNLayer


class MoEMLP(nn.Module):
    num_experts: int = 4
    hidden_size: int = 64
    capacity_factor: float = 1.5

    @nn.compact
    def __call__(self, x: jnp.ndarray, training: bool = False):
        N, D = x.shape
        E, H = self.num_experts, self.hidden_size
        w_gate = self.param("gate", nn.initializers.glorot_uniform(), (D, E))
        w1 = self.param("w1", nn.initializers.glorot_uniform(), (E, D, H))
        b1 = self.param("b1", nn.initializers.zeros, (E, H))
        w2 = self.param("w2", nn.initializers.glorot_uniform(), (E, H, D))
        b2 = self.param("b2", nn.initializers.zeros, (E, D))

        logits = x @ w_gate                       # [N, E]
        probs = jax.nn.softmax(logits, -1)
        expert = jnp.argmax(probs, -1)            # top-1 routing
        gate = jnp.take_along_axis(probs, expert[:, None], 1)  # [N, 1]
        onehot = jax.nn.one_hot(expert, E, dtype=x.dtype)      # [N, E]
        # dense dispatch (capacity-free: every token computed by its expert
        # via batched einsum over the expert axis — MXU-friendly)
        h = jnp.einsum("nd,edh->neh", x, w1) + b1[None]
        h = jax.nn.gelu(h)
        y = jnp.einsum("neh,ehd->ned", h, w2) + b2[None]
        out = jnp.einsum("ne,ned->nd", onehot, y)
        return out * gate


class MoEGCN(nn.Module):
    in_features: int
    out_features: int
    hidden_size: int = 64
    num_layers: int = 2
    num_experts: int = 4
    dropout: float = 0.5

    @nn.compact
    def __call__(self, graph: Graph, x: Optional[jnp.ndarray] = None,
                 training: bool = False):
        if x is None:
            x = graph.x
        g = sym_norm(graph)
        for i in range(self.num_layers - 1):
            x = GCNLayer(self.hidden_size, dropout=self.dropout,
                         activation="relu", name=f"gcn{i}")(g, x, training)
            x = x + MoEMLP(self.num_experts, self.hidden_size,
                           name=f"moe{i}")(x, training)
        return GCNLayer(self.out_features, name=f"gcn{self.num_layers-1}")(
            g, x, training)
