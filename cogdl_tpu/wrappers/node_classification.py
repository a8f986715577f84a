"""Full-batch node classification wrapper.

Rebuild of the reference pair FullBatchNodeClfDataWrapper +
NodeClfModelWrapper (cogdl/wrappers/data_wrapper/node_classification/
node_classification_dw.py:5-20, model_wrapper/node_classification/
node_classification_mw.py:5): masked cross-entropy on train nodes, accuracy
(or micro-F1 for multilabel y) on val/test.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from ..data.graph import Graph, add_self_loops
from ..utils.evaluator import (
    bce_with_logits_loss,
    masked_accuracy,
    masked_cross_entropy,
)


class NodeClfWrapper:
    eval_metric = "val_acc"
    eval_mode = "max"

    def __init__(self, model, dataset=None):
        self.model = model
        self.dataset = dataset

    # -- data ---------------------------------------------------------------
    def prepare_graph(self, graph: Graph) -> Graph:
        """pre_transform: add self loops (reference node_classification_dw:19)
        and pre-apply the model's adjacency normalisation once so the jitted
        step doesn't recompute [E]-sized norms every call."""
        graph = add_self_loops(graph)
        norm = getattr(self.model, "adj_norm", None)
        if norm == "sym":
            from ..data.graph import sym_norm

            graph = sym_norm(graph)
        elif norm == "row":
            from ..data.graph import row_norm

            graph = row_norm(graph)
        from ..ops.pallas import _is_tpu, prepare_spmm

        if _is_tpu():
            graph = prepare_spmm(graph)
        return graph

    def train_batches(self, graph: Graph):
        return [graph]

    # -- steps (jit-compatible pure functions) ------------------------------
    def init(self, rng, graph: Graph):
        return self.model.init(
            {"params": rng, "dropout": rng}, graph, graph.x, training=False
        )

    def multilabel(self, graph: Graph) -> bool:
        return graph.y is not None and graph.y.ndim == 2

    def loss(self, variables, graph: Graph, rng, training: bool = True):
        mutable = ["batch_stats"] if "batch_stats" in variables else False
        out = self.model.apply(
            variables, graph, graph.x, training=training,
            rngs={"dropout": rng}, mutable=mutable,
        )
        logits, updates = out if mutable else (out, {})
        mask = graph.train_mask & graph.node_mask()
        if self.multilabel(graph):
            loss = bce_with_logits_loss(logits, graph.y, mask)
        else:
            loss = masked_cross_entropy(logits, graph.y, mask)
        return loss, updates

    def evaluate(self, variables, graph: Graph) -> Dict[str, jnp.ndarray]:
        logits = self.model.apply(variables, graph, graph.x, training=False)
        node_m = graph.node_mask()
        out = {}
        for split, m in (("train", graph.train_mask), ("val", graph.val_mask),
                         ("test", graph.test_mask)):
            if m is None:
                continue
            mask = m & node_m
            if self.multilabel(graph):
                pred = (logits > 0).astype(jnp.float32)
                tgt = graph.y.astype(jnp.float32)
                mm = mask.astype(jnp.float32)[:, None]
                tp = jnp.sum(pred * tgt * mm)
                fp = jnp.sum(pred * (1 - tgt) * mm)
                fn = jnp.sum((1 - pred) * tgt * mm)
                out[f"{split}_acc"] = 2 * tp / jnp.maximum(2 * tp + fp + fn, 1.0)
            else:
                out[f"{split}_acc"] = masked_accuracy(logits, graph.y, mask)
        return out


class GCNMixWrapper(NodeClfWrapper):
    """Manifold mixup with matching label mixing: the loss targets
    lam·y + (1−lam)·y[perm], paired with the model's mixed hidden states."""

    def loss(self, variables, graph, rng, training: bool = True):
        from ..utils.evaluator import masked_cross_entropy

        logits, perm, lam = self.model.apply(
            variables, graph, graph.x, True,
            method=self.model.mixup_forward, rngs={"dropout": rng})
        mask = graph.train_mask & graph.node_mask()
        l_a = masked_cross_entropy(logits, graph.y, mask)
        l_b = masked_cross_entropy(logits, graph.y[perm], mask)
        return lam * l_a + (1.0 - lam) * l_b, {}
