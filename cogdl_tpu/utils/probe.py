"""Embedding probes: logistic-regression / SVM evaluation of frozen embeddings
(reference cogdl/wrappers/tools/wrapper_utils.py:25-268 — liblinear one-vs-rest
and logreg evaluation)."""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np


def _standardize(emb: np.ndarray) -> np.ndarray:
    mu = emb.mean(0, keepdims=True)
    sd = emb.std(0, keepdims=True)
    return (emb - mu) / np.maximum(sd, 1e-8)


def logreg_probe(emb: np.ndarray, graph) -> Dict[str, float]:
    """Fit logreg on train-mask embeddings, report split accuracies."""
    from sklearn.linear_model import LogisticRegression

    emb = _standardize(emb)
    y = np.asarray(graph.y)
    out = {}
    tr = np.asarray(graph.train_mask) & np.asarray(graph.node_mask())
    clf = LogisticRegression(max_iter=500)
    clf.fit(emb[tr], y[tr])
    for split, m in (("train", graph.train_mask), ("val", graph.val_mask),
                     ("test", graph.test_mask)):
        if m is None:
            continue
        mask = np.asarray(m) & np.asarray(graph.node_mask())
        if mask.sum() == 0:
            continue
        out[f"{split}_acc"] = float(clf.score(emb[mask], y[mask]))
    return out


def f1_label_probe(
    emb: np.ndarray,
    labels: np.ndarray,
    train_ratio: float = 0.9,
    n_shuffles: int = 5,
    seed: int = 0,
) -> Dict[str, float]:
    """Micro/macro-F1 over shuffled train/test splits — the network-embedding
    evaluation protocol (reference wrapper_utils.py:191-244, 90% labels)."""
    from sklearn.linear_model import LogisticRegression
    from sklearn.metrics import f1_score
    from sklearn.multiclass import OneVsRestClassifier

    rng = np.random.default_rng(seed)
    emb = _standardize(emb)
    multilabel = labels.ndim == 2
    micro, macro = [], []
    for _ in range(n_shuffles):
        idx = rng.permutation(emb.shape[0])
        n_tr = int(train_ratio * emb.shape[0])
        tr, te = idx[:n_tr], idx[n_tr:]
        if multilabel:
            clf = OneVsRestClassifier(LogisticRegression(max_iter=300))
            clf.fit(emb[tr], labels[tr])
            prob = clf.predict_proba(emb[te])
            # top-k prediction with true label counts (standard protocol)
            k = labels[te].sum(1).astype(int)
            pred = np.zeros_like(labels[te])
            for i, ki in enumerate(k):
                if ki > 0:
                    top = np.argsort(prob[i])[-ki:]
                    pred[i, top] = 1
        else:
            clf = LogisticRegression(max_iter=300)
            clf.fit(emb[tr], labels[tr])
            pred = clf.predict(emb[te])
        micro.append(f1_score(labels[te], pred, average="micro"))
        macro.append(f1_score(labels[te], pred, average="macro"))
    return {
        "test_micro_f1": float(np.mean(micro)),
        "test_macro_f1": float(np.mean(macro)),
        "micro_f1_std": float(np.std(micro)),
    }
