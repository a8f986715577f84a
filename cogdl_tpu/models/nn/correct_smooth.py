"""Correct & Smooth — MLP predictor + label-propagation post-processing
(reference cogdl/models/nn/correct_smooth.py). The C&S steps are pure
propagation scans, applied at prediction time by ``postprocess``."""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...data.graph import Graph, sym_norm
from ...layers import MLP
from ...ops import spmm


class CorrectSmoothMLP(nn.Module):
    in_features: int
    out_features: int
    hidden_size: int = 64
    num_layers: int = 3
    dropout: float = 0.5
    correct_alpha: float = 0.8
    smooth_alpha: float = 0.8
    correct_steps: int = 50
    smooth_steps: int = 50

    @nn.compact
    def __call__(self, graph: Graph, x: Optional[jnp.ndarray] = None,
                 training: bool = False):
        if x is None:
            x = graph.x
        return MLP(self.out_features, hidden_features=self.hidden_size,
                   num_layers=self.num_layers, dropout=self.dropout,
                   name="mlp")(x, training)

    def postprocess(self, graph: Graph, logits: jnp.ndarray) -> jnp.ndarray:
        """C&S: propagate train-residual errors, then smooth predictions."""
        g = sym_norm(graph)
        y_onehot = jax.nn.one_hot(graph.y, logits.shape[-1])
        probs = jax.nn.softmax(logits, axis=-1)
        train = (graph.train_mask & graph.node_mask()).astype(probs.dtype)[:, None]

        err = (y_onehot - probs) * train

        def correct_step(e, _):
            return (self.correct_alpha * spmm(g, e)
                    + (1 - self.correct_alpha) * err), None

        err_prop, _ = jax.lax.scan(correct_step, err, None,
                                   length=self.correct_steps)
        scale = 1.0  # autoscale variant omitted; fixed-scale correct
        probs = probs + scale * err_prop

        base = probs * (1 - train) + y_onehot * train

        def smooth_step(h, _):
            return (self.smooth_alpha * spmm(g, h)
                    + (1 - self.smooth_alpha) * base), None

        smoothed, _ = jax.lax.scan(smooth_step, base, None,
                                   length=self.smooth_steps)
        return smoothed
