"""PATCHY-SAN — canonical neighborhood assembly + 1-D conv classifier
(reference cogdl/models/nn/patchy_san.py). Receptive fields are assembled
host-side (degree-ranked BFS, fixed width) into [G, w, k, F] tensors; the
conv net is standard."""

from __future__ import annotations

from typing import List, Optional

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from ...data.graph import Graph


def assemble_fields(graphs: List[Graph], width: int = 16, k: int = 8):
    """For each graph: pick `width` nodes by degree rank, take each node's
    top-k neighbors by degree → index tensor [G, width, k]."""
    fields = []
    for g in graphs:
        E, N = g.num_edges, g.num_nodes
        row = np.asarray(g.row)[:E]
        col = np.asarray(g.col)[:E]
        deg = np.bincount(row, minlength=N)
        order = np.argsort(-deg)
        centers = order[:width]
        fld = np.zeros((width, k), np.int64)
        for i, c in enumerate(centers[: min(width, N)]):
            nbrs = col[row == c]
            nbrs = nbrs[np.argsort(-deg[nbrs])][: k - 1]
            seq = np.concatenate([[c], nbrs])
            fld[i, : len(seq)] = seq
        fields.append(fld)
    return np.stack(fields)


class PatchySAN(nn.Module):
    in_features: int
    out_features: int
    hidden_size: int = 32
    width: int = 16
    k: int = 8
    dropout: float = 0.3

    @nn.compact
    def __call__(self, batch, x: Optional[jnp.ndarray] = None,
                 training: bool = False):
        """``batch``: dict with 'fields' [G, w, k] and 'feats' [G, w, k, F]."""
        feats = batch["feats"] if isinstance(batch, dict) else batch
        G, w, k, F = feats.shape
        h = feats.reshape(G, w * k, F)
        h = nn.Conv(self.hidden_size, kernel_size=(k,), strides=(k,),
                    name="conv1")(h)
        h = nn.relu(h)
        h = nn.Conv(self.hidden_size, kernel_size=(4,), name="conv2")(h)
        h = nn.relu(h)
        h = h.reshape(G, -1)
        if self.dropout > 0 and training:
            h = nn.Dropout(rate=self.dropout, deterministic=False)(h)
        h = nn.relu(nn.Dense(128, name="fc")(h))
        return nn.Dense(self.out_features, name="out")(h)
