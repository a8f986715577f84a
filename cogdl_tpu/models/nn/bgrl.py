"""BGRL — bootstrapped graph representation learning (BYOL for graphs).

Rebuild of the reference's examples/bgrl (models.py BGRL/Encoder/EMA,
train.py): a student GCN encoder + predictor chases an EMA teacher across
two augmented views (edge dropping + feature masking), with a
cosine-annealed EMA decay and no negative samples. Evaluation is the
standard frozen-embedding logistic-regression probe.

TPU-native formulation: the teacher is not a second module object — it is a
pytree (params + BN stats of the encoder subtree) carried in the Trainer's
model_state and EMA-updated inside the jitted step (the reference's
`update_moving_average` loop over `.data` tensors becomes one tree_map).
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from ...data.graph import Graph, sym_norm
from ...layers import GCNLayer


class BGRLEncoder(nn.Module):
    """Reference examples/bgrl/models.py:49 Encoder: two GCN blocks with
    BatchNorm (momentum 0.99) and PReLU."""

    hidden_size: int
    rep_size: int

    @nn.compact
    def __call__(self, graph: Graph, x: jnp.ndarray, training: bool = False):
        from ...layers.utils import MaskedBatchNorm

        g = sym_norm(graph)
        mask = graph.node_mask()   # pad rows must not skew batch statistics
        x = GCNLayer(self.hidden_size, bias=False, name="gcn1")(g, x, training)
        x = MaskedBatchNorm(momentum=0.99, name="bn1")(
            x, mask, use_running_average=not training)
        x = nn.PReLU()(x)
        x = GCNLayer(self.rep_size, bias=False, name="gcn2")(g, x, training)
        x = MaskedBatchNorm(momentum=0.99, name="bn2")(
            x, mask, use_running_average=not training)
        return nn.PReLU()(x)


class BGRL(nn.Module):
    in_features: int
    out_features: int = 0          # SSL — classes come from the probe
    hidden_size: int = 256
    rep_size: Optional[int] = None
    pred_hid: Optional[int] = None

    def setup(self):
        rep = self.rep_size or self.hidden_size
        self.enc = BGRLEncoder(self.hidden_size, rep, name="enc")
        self.pred = nn.Sequential([
            nn.Dense(self.pred_hid or self.hidden_size, name="pred1"),
            nn.PReLU(),
            nn.Dense(rep, name="pred2"),
        ])

    def embed(self, graph: Graph, x: Optional[jnp.ndarray] = None,
              training: bool = False):
        if x is None:
            x = graph.x
        return self.enc(graph, x, training)

    def student(self, graph: Graph, x: jnp.ndarray, training: bool = True):
        """Online branch: encoder followed by the predictor."""
        return self.pred(self.enc(graph, x, training))

    def __call__(self, graph: Graph, x: Optional[jnp.ndarray] = None,
                 training: bool = False):
        return self.embed(graph, x, training)
