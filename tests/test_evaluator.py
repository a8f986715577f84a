"""Metric accumulators reduce exactly across batches (reference
utils/evaluator.py contract)."""

import jax.numpy as jnp
import numpy as np

from cogdl_tpu.utils.evaluator import (
    MAE,
    Accuracy,
    MultiLabelMicroF1,
    bce_with_logits_loss,
    build_evaluator,
    cross_entropy_loss,
    masked_accuracy,
    masked_cross_entropy,
)


def test_accuracy_batched_equals_whole():
    logits = jnp.asarray(np.random.default_rng(0).normal(size=(100, 4)))
    y = jnp.asarray(np.random.default_rng(1).integers(0, 4, 100))
    whole = Accuracy()
    whole(logits, y)
    batched = Accuracy()
    for s in range(0, 100, 32):
        batched(logits[s: s + 32], y[s: s + 32])
    assert abs(whole.evaluate() - batched.evaluate()) < 1e-9


def test_microf1_known_value():
    ev = MultiLabelMicroF1()
    logits = jnp.asarray([[1.0, -1.0], [1.0, 1.0]])
    y = jnp.asarray([[1.0, 0.0], [0.0, 1.0]])
    # tp=2 (0,0 and 1,1), fp=1 (1,0), fn=0
    f1 = ev(logits, y)
    assert abs(f1 - (2 * 2 / (2 * 2 + 1 + 0))) < 1e-9


def test_mae_accumulates():
    ev = MAE()
    ev(jnp.asarray([1.0, 2.0]), jnp.asarray([0.0, 0.0]))
    ev(jnp.asarray([3.0]), jnp.asarray([0.0]))
    assert abs(ev.evaluate() - 2.0) < 1e-9


def test_masked_losses_ignore_pad():
    logits = jnp.asarray([[10.0, -10.0], [0.0, 0.0], [99.0, 99.0]])
    y = jnp.asarray([0, 1, 0])
    mask = jnp.asarray([True, True, False])
    l1 = masked_cross_entropy(logits, y, mask)
    # row 2 excluded: loss = mean(CE(row0), CE(row1))
    assert np.isfinite(float(l1))
    acc = masked_accuracy(logits, y, mask)
    assert abs(float(acc) - 0.5) < 1e-9


def test_bce_masked():
    logits = jnp.zeros((4, 3))
    y = jnp.ones((4, 3))
    m = jnp.asarray([True, True, False, False])
    l = float(bce_with_logits_loss(logits, y, m))
    assert abs(l - float(np.log(2))) < 1e-6


def test_build_evaluator():
    assert isinstance(build_evaluator("accuracy"), Accuracy)
    assert isinstance(build_evaluator("microf1"), MultiLabelMicroF1)
    assert isinstance(build_evaluator("mae"), MAE)
