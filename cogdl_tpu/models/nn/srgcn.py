"""SRGCN — structured relational GCN with a typed attention × normalization
matrix (reference cogdl/models/nn/srgcn.py + utils/srgcn_utils.py:17-266).

Attention types (srgcn_utils ``act_attention``): ``node`` (:17), ``edge``
(:40), ``identity`` (:67), ``gaussian`` (:75), ``ppr`` (:113), ``heat``
(:148). Normalizations (``act_normalization``): ``identity``,
``row_uniform``, ``row_softmax``, ``col_uniform``, ``symmetry`` (:183-247).

TPU-first redesign: the reference materialises transformed adjacencies with
dynamic-sparsity spspmm products (gaussian/PPR densify the matrix — shapes
depend on values). Here every attention type either (a) rewrites the EDGE
WEIGHTS in place (node/edge/identity/heat — static shapes, same formulas)
or (b) is applied as a PROPAGATION SERIES at aggregation time
(gaussian/ppr: ``Σ_i θ_i A^i x`` — mathematically the same product the
reference's materialised ``Σ θ_i A^i`` adjacency yields, without ever
building value-dependent sparsity)."""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ...data.graph import Graph
from ...ops import spmm_coo
from ...ops import segment as seg

ATTENTION_TYPES = ("node", "edge", "identity", "gaussian", "ppr", "heat")
NORM_TYPES = ("identity", "row_uniform", "row_softmax", "col_uniform",
              "symmetry")


def _degrees(graph: Graph) -> jnp.ndarray:
    ones = graph.edge_mask().astype(jnp.float32)
    return jnp.maximum(jax.ops.segment_sum(
        ones, graph.row, graph.n_pad, indices_are_sorted=True), 1.0)


def _normalize(norm: str, graph: Graph, w: jnp.ndarray) -> jnp.ndarray:
    """srgcn_utils.py:183-247 — all five normalizations as edge ops."""
    row, col, n = graph.row, graph.col, graph.n_pad
    if norm == "identity":
        return w
    if norm == "row_softmax":
        w = jnp.exp(w) * graph.edge_mask()
    s_row = jax.ops.segment_sum(w, row, n, indices_are_sorted=True)
    if norm in ("row_uniform", "row_softmax"):
        return w / jnp.maximum(jnp.take(s_row, row, mode="clip"), 1e-12)
    if norm == "col_uniform":
        return w / jnp.maximum(jnp.take(s_row, col, mode="clip"), 1e-12)
    if norm == "symmetry":
        inv_sqrt = jax.lax.rsqrt(jnp.maximum(s_row, 1e-12))
        return (w * jnp.take(inv_sqrt, row, mode="clip")
                * jnp.take(inv_sqrt, col, mode="clip"))
    raise ValueError(f"normalization {norm!r}; known: {NORM_TYPES}")


class SRGCNLayer(nn.Module):
    out_features: int
    attention: str = "node"
    normalization: str = "row_uniform"
    nhop: int = 1
    subheads: int = 2
    dropout: float = 0.5
    activation: str = "leaky_relu"

    @nn.compact
    def __call__(self, graph: Graph, x: jnp.ndarray, training: bool = False):
        deg_inv = 1.0 / _degrees(graph)
        w0 = graph.edge_weight
        outs = []
        for r in range(self.subheads):
            h = nn.Dense(self.out_features, use_bias=False,
                         name=f"W{r}")(x)
            series = None
            if self.attention == "identity":
                w = w0
            elif self.attention == "node":        # srgcn_utils.py:17
                diag = jax.nn.sigmoid(
                    nn.Dense(1, name=f"att_p{r}")(h))[:, 0]
                w = (w0 * jnp.take(deg_inv, graph.row, mode="clip")
                     * jnp.take(diag, graph.col, mode="clip"))
            elif self.attention == "edge":        # srgcn_utils.py:40
                p = nn.relu(nn.Dense(1, name=f"att_p{r}")(h))[:, 0]
                q = nn.relu(nn.Dense(1, name=f"att_q{r}")(h))[:, 0]
                dis = jax.lax.rsqrt(_degrees(graph))
                wt = (w0 * jnp.take(dis, graph.row, mode="clip")
                      * jnp.take(dis, graph.col, mode="clip"))
                w = wt * (jnp.take(p, graph.col, mode="clip")
                          + jnp.take(q, graph.row, mode="clip"))
            elif self.attention == "heat":        # srgcn_utils.py:148
                t = self.param(f"heat_t{r}", nn.initializers.zeros, (1,))
                w = jnp.exp(t * w0 * jnp.take(deg_inv, graph.col,
                                              mode="clip") - t)
                w = w * graph.edge_mask()
            elif self.attention == "ppr":         # srgcn_utils.py:113
                alpha, steps = 0.4, 4
                series = [alpha]                  # identity term
                th = alpha * (1 - alpha)
                for _ in range(steps - 1):
                    series.append(th)
                    th *= (1 - alpha)
                dis = jax.lax.rsqrt(_degrees(graph))
                w = (w0 * jnp.take(dis, graph.row, mode="clip")
                     * jnp.take(dis, graph.col, mode="clip"))
            elif self.attention == "gaussian":    # srgcn_utils.py:75
                # Chebyshev expansion of exp(-θ(L−μI)) around the rescaled
                # Laplacian — Bessel coefficients as in the reference
                from scipy.special import iv

                mu, theta, steps = 0.2, 1.0, 4
                coef = [float(iv(i, theta)) for i in range(steps)]
                coef[1:] = [(-1.0) ** i * 2 * c
                            for i, c in enumerate(coef[1:])]
                series = coef
                w = w0 * jnp.take(deg_inv, graph.row, mode="clip")
            else:
                raise ValueError(
                    f"attention {self.attention!r}; known: {ATTENTION_TYPES}")

            w = _normalize(self.normalization, graph, w)
            if series is None:
                z = h
                for _ in range(self.nhop):
                    z = spmm_coo(z, graph.row, graph.col, w, graph.n_pad)
            else:
                # propagation series Σ_i θ_i A^i h (gaussian uses the
                # shifted-Laplacian recursion folded into powers of A)
                z = series[0] * h
                t = h
                for c in series[1:]:
                    t = spmm_coo(t, graph.row, graph.col, w, graph.n_pad)
                    z = z + c * t
            outs.append(z)
        out = sum(outs) / len(outs)
        if self.dropout > 0 and training:
            out = nn.Dropout(self.dropout, deterministic=False)(out)
        return out


class SRGCN(nn.Module):
    in_features: int
    out_features: int
    hidden_size: int = 64
    attention: str = "node"
    normalization: str = "row_uniform"
    nhop: int = 1
    subheads: int = 2
    dropout: float = 0.5

    @nn.compact
    def __call__(self, graph: Graph, x: Optional[jnp.ndarray] = None,
                 training: bool = False):
        if x is None:
            x = graph.x
        h = SRGCNLayer(self.hidden_size, attention=self.attention,
                       normalization=self.normalization, nhop=self.nhop,
                       subheads=self.subheads, dropout=self.dropout,
                       name="layer0")(graph, x, training)
        h = nn.leaky_relu(h)
        return SRGCNLayer(self.out_features, attention=self.attention,
                          normalization=self.normalization, nhop=self.nhop,
                          subheads=self.subheads, dropout=0.0,
                          name="layer1")(graph, h, training)
