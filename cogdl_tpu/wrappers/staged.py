"""Multi-stage self-training wrappers.

Rebuild of reference sagn_mw (pre_stage generates self-training pseudo-label
probabilities, sagn_mw.py:38-54) and m3s_mw (KMeans-based label expansion,
m3s_mw.py:12-50) on top of the Trainer's stage hooks.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..data.graph import Graph
from .node_classification import NodeClfWrapper


class SAGNWrapper(NodeClfWrapper):
    """Stage 0 trains on true labels; later stages add high-confidence
    pseudo-labels on unlabeled nodes (threshold on softmax max)."""

    num_stages = 2

    def __init__(self, model, dataset=None, threshold: float = 0.9,
                 num_stages: int = 2):
        super().__init__(model, dataset)
        self.threshold = threshold
        self.num_stages = num_stages
        self._pseudo_mask = None
        self._pseudo_y = None

    def pre_stage(self, stage: int, graph: Graph, variables) -> Optional[Graph]:
        if stage == 0:
            return None
        logits = self.model.apply(variables, graph, graph.x, training=False)
        probs = jax.nn.softmax(logits, -1)
        conf = jnp.max(probs, -1)
        pred = jnp.argmax(probs, -1).astype(graph.y.dtype)
        # pseudo-label only truly-unlabeled nodes: val/test nodes must keep
        # their ground-truth labels or later-stage evaluation would score
        # the model against its own predictions (inflated accuracy)
        unlabeled = (~graph.train_mask) & graph.node_mask()
        if graph.val_mask is not None:
            unlabeled &= ~graph.val_mask
        if graph.test_mask is not None:
            unlabeled &= ~graph.test_mask
        take = unlabeled & (conf > self.threshold)
        new_y = jnp.where(take, pred, graph.y)
        new_train = graph.train_mask | take
        return graph.replace(y=new_y, train_mask=new_train)


class M3SWrapper(NodeClfWrapper):
    """M3S: per-stage KMeans over embeddings; clusters aligned to classes
    expand the training set (reference m3s_mw.py)."""

    num_stages = 2

    def __init__(self, model, dataset=None, num_stages: int = 2,
                 num_new_labels: int = 20):
        super().__init__(model, dataset)
        self.num_stages = num_stages
        self.num_new_labels = num_new_labels

    def pre_stage(self, stage: int, graph: Graph, variables) -> Optional[Graph]:
        if stage == 0:
            return None
        from sklearn.cluster import KMeans

        emb_fn = getattr(self.model, "embed", None)
        if emb_fn is None:
            return None
        emb = np.asarray(self.model.apply(variables, graph, graph.x,
                                          method=self.model.embed))
        nmask = np.asarray(graph.node_mask())
        y = np.asarray(graph.y)
        train = np.asarray(graph.train_mask) & nmask
        # nodes whose labels may be overwritten: not train, not val/test
        # (evaluation must stay against ground truth)
        reserved = train.copy()
        for m in (graph.val_mask, graph.test_mask):
            if m is not None:
                reserved |= np.asarray(m)
        C = int(y[nmask].max()) + 1
        km = KMeans(n_clusters=C * 2, n_init=3, random_state=0).fit(
            emb[nmask])
        clusters = np.full(graph.n_pad, -1)
        clusters[nmask] = km.labels_
        new_train = train.copy()
        new_y = y.copy()
        # align each cluster to its majority training label; adopt the most
        # central unlabeled nodes
        for c in range(C * 2):
            members = np.nonzero((clusters == c) & nmask)[0]
            lab_members = members[train[members]]
            if lab_members.size == 0:
                continue
            maj = np.bincount(y[lab_members], minlength=C).argmax()
            cand = members[~reserved[members]]
            if cand.size == 0:
                continue
            center = km.cluster_centers_[c]
            d = np.linalg.norm(emb[cand] - center, axis=1)
            take = cand[np.argsort(d)[: self.num_new_labels]]
            new_train[take] = True
            new_y[take] = maj
        return graph.replace(y=jnp.asarray(new_y),
                             train_mask=jnp.asarray(new_train))


class CorrectSmoothWrapper(NodeClfWrapper):
    """MLP training + C&S post-processing at evaluation time
    (reference correct_smooth_mw)."""

    def evaluate(self, variables, graph: Graph) -> Dict[str, jnp.ndarray]:
        from ..utils.evaluator import masked_accuracy

        logits = self.model.apply(variables, graph, graph.x, training=False)
        logits = self.model.apply(variables, graph, logits,
                                  method=self.model.postprocess)
        node_m = graph.node_mask()
        out = {}
        for split, m in (("train", graph.train_mask), ("val", graph.val_mask),
                         ("test", graph.test_mask)):
            if m is not None:
                out[f"{split}_acc"] = masked_accuracy(logits, graph.y,
                                                      m & node_m)
        return out
