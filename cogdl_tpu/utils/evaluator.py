"""Metrics and losses — rebuild of reference cogdl/utils/evaluator.py.

Evaluators accumulate exact sufficient statistics (tp/total) as jax scalars so
they reduce exactly across batches and devices (psum-able), mirroring the
reference's list-accumulator design (evaluator.py:72-103) without host sync.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# Losses (pure, mask-aware; masks handle both splits and node padding)
# ---------------------------------------------------------------------------

def cross_entropy_loss(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    logp = jax.nn.log_softmax(logits, axis=-1)
    if labels.ndim == logits.ndim:  # one-hot / soft labels
        return -jnp.mean(jnp.sum(labels * logp, axis=-1))
    onehot = jax.nn.one_hot(labels, logits.shape[-1], dtype=logits.dtype)
    return -jnp.mean(jnp.sum(onehot * logp, axis=-1))


def masked_cross_entropy(logits, labels, mask) -> jnp.ndarray:
    """Mean CE over masked nodes (reference NodeClfModelWrapper loss,
    node_classification_mw.py:11)."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    if labels.ndim == logits.ndim:
        per_node = -jnp.sum(labels * logp, axis=-1)
    else:
        labels_safe = jnp.clip(labels, 0, logits.shape[-1] - 1)
        per_node = -jnp.take_along_axis(
            logp, labels_safe[..., None].astype(jnp.int32), axis=-1
        ).squeeze(-1)
    m = mask.astype(logits.dtype)
    return jnp.sum(per_node * m) / jnp.maximum(jnp.sum(m), 1.0)


def bce_with_logits_loss(logits, targets, mask=None) -> jnp.ndarray:
    per = jnp.maximum(logits, 0) - logits * targets + jnp.log1p(
        jnp.exp(-jnp.abs(logits)))
    if mask is not None:
        m = mask.astype(logits.dtype)
        if m.ndim < per.ndim:
            m = m.reshape(m.shape + (1,) * (per.ndim - m.ndim))
        return jnp.sum(per * m) / jnp.maximum(
            jnp.sum(jnp.broadcast_to(m, per.shape)), 1.0)
    return jnp.mean(per)


def masked_accuracy(logits, labels, mask) -> jnp.ndarray:
    pred = jnp.argmax(logits, axis=-1)
    correct = (pred == labels).astype(jnp.float32) * mask.astype(jnp.float32)
    return jnp.sum(correct) / jnp.maximum(jnp.sum(mask.astype(jnp.float32)), 1.0)


# ---------------------------------------------------------------------------
# Accumulating evaluators
# ---------------------------------------------------------------------------

class Accuracy:
    """Exact accuracy accumulator (reference utils/evaluator.py:72)."""

    def __init__(self):
        self.correct = 0.0
        self.total = 0.0

    def __call__(self, logits, labels, mask=None):
        pred = jnp.argmax(logits, axis=-1)
        ok = (pred == labels).astype(jnp.float32)
        if mask is not None:
            m = mask.astype(jnp.float32)
            self.correct += float(jnp.sum(ok * m))
            self.total += float(jnp.sum(m))
        else:
            self.correct += float(jnp.sum(ok))
            self.total += float(ok.size)
        return self.evaluate()

    def evaluate(self) -> float:
        return self.correct / max(self.total, 1.0)

    def clear(self):
        self.correct = self.total = 0.0


class MultiLabelMicroF1:
    """Micro-F1 for multilabel targets with 0.5 threshold
    (reference utils/evaluator.py:107)."""

    def __init__(self):
        self.tp = self.fp = self.fn = 0.0

    def __call__(self, logits, labels, mask=None):
        pred = (logits > 0).astype(jnp.float32)  # sigmoid(x) > .5 ⇔ x > 0
        tgt = labels.astype(jnp.float32)
        if mask is not None:
            m = mask.astype(jnp.float32)
            m = m.reshape(m.shape + (1,) * (pred.ndim - m.ndim))
            pred, tgt = pred * m, tgt * m
        self.tp += float(jnp.sum(pred * tgt))
        self.fp += float(jnp.sum(pred * (1 - tgt)))
        self.fn += float(jnp.sum((1 - pred) * tgt))
        return self.evaluate()

    def evaluate(self) -> float:
        denom = 2 * self.tp + self.fp + self.fn
        return 2 * self.tp / denom if denom > 0 else 0.0

    def clear(self):
        self.tp = self.fp = self.fn = 0.0


class MAE:
    """Mean absolute error (traffic prediction; reference evaluator.py:50)."""

    def __init__(self):
        self.err = 0.0
        self.total = 0.0

    def __call__(self, pred, target, mask=None):
        e = jnp.abs(pred - target)
        if mask is not None:
            m = mask.astype(jnp.float32)
            m = m.reshape(m.shape + (1,) * (e.ndim - m.ndim))
            self.err += float(jnp.sum(e * m))
            self.total += float(jnp.sum(jnp.broadcast_to(m, e.shape)))
        else:
            self.err += float(jnp.sum(e))
            self.total += float(e.size)
        return self.evaluate()

    def evaluate(self) -> float:
        return self.err / max(self.total, 1.0)

    def clear(self):
        self.err = self.total = 0.0


def build_evaluator(metric: str):
    return {"accuracy": Accuracy, "acc": Accuracy,
            "microf1": MultiLabelMicroF1, "mae": MAE}[metric]()
