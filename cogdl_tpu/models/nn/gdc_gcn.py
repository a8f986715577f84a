"""GDC-GCN — graph diffusion convolution preprocessing + GCN
(reference cogdl/models/nn/gdc_gcn.py): heat/PPR diffusion of the adjacency,
sparsified, then a standard GCN on the diffused graph."""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from ...data.graph import Graph, from_coo
from .gcn import GCN


def gdc_diffuse(graph: Graph, alpha: float = 0.05, eps: float = 1e-4,
                method: str = "ppr") -> Graph:
    """Host-side: exact PPR diffusion S = α(I-(1-α)T)⁻¹, ε-sparsified."""
    import scipy.sparse as sp

    from ..emb.base import graph_to_scipy

    A = graph_to_scipy(graph)
    N = A.shape[0]
    deg = np.asarray(A.sum(1)).ravel()
    T = A @ sp.diags(1.0 / np.maximum(deg, 1e-12))
    if method == "ppr":
        S = alpha * np.linalg.inv(np.eye(N) - (1 - alpha) * T.toarray())
    else:  # heat kernel, truncated series
        t = 5.0
        Td = T.toarray()
        S = np.zeros_like(Td)
        term = np.eye(N) * np.exp(-t)
        for k in range(10):
            S += term
            term = term @ Td * (t / (k + 1))
    S[S < eps] = 0.0
    r, c = np.nonzero(S)
    g = from_coo(np.stack([r, c]), num_nodes=N,
                 edge_weight=S[r, c].astype(np.float32),
                 meta=dict(graph.meta))
    return g.replace(x=graph.x[: g.n_pad], y=graph.y[: g.n_pad],
                     train_mask=graph.train_mask[: g.n_pad],
                     val_mask=graph.val_mask[: g.n_pad],
                     test_mask=graph.test_mask[: g.n_pad])


class GDCGCN(GCN):
    """GCN over a diffusion-preprocessed graph; wrapper applies gdc_diffuse."""
    adj_norm: str = "none"
