"""Graph classification wrapper — rebuild of the reference pair
graph_classification_dw/mw (cogdl/wrappers/*/graph_classification.py):
union-batched multi-graph training with per-graph CE loss and a train/val/test
split over graphs.
"""

from __future__ import annotations

from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..data.batch import make_batches
from ..utils.evaluator import cross_entropy_loss


class GraphClfWrapper:
    eval_metric = "val_acc"
    eval_mode = "max"
    jit_eval = False  # loops over batches with host accumulation

    def __init__(self, model, dataset=None, batch_size: int = 32,
                 train_ratio: float = 0.7, val_ratio: float = 0.1,
                 seed: int = 0):
        self.model = model
        self.dataset = dataset
        self.batch_size = batch_size
        graphs, labels = dataset.graphs, np.asarray(dataset.labels)
        official = getattr(dataset, "split_idx", None)
        if official:  # e.g. OGB scaffold splits (datasets/ogb.py build_graph)
            self._splits = {
                "train": np.asarray(official["train"]),
                "val": np.asarray(official.get("valid",
                                               official.get("val", []))),
                "test": np.asarray(official.get("test", [])),
            }
        else:
            rng = np.random.default_rng(seed)
            idx = rng.permutation(len(graphs))
            n_tr = int(train_ratio * len(graphs))
            n_va = int(val_ratio * len(graphs))
            self._splits = {
                "train": idx[:n_tr],
                "val": idx[n_tr: n_tr + n_va],
                "test": idx[n_tr + n_va:],
            }
        self._batches = {
            split: make_batches([graphs[i] for i in ids], labels[ids],
                                batch_size, shuffle=(split == "train"),
                                seed=seed)
            for split, ids in self._splits.items()
        }

    def prepare_graph(self, graph):
        return graph  # batching already done in __init__

    def train_batches(self, graph=None):
        return self._batches["train"]

    def init(self, rng, graph=None):
        b = self._batches["train"][0]
        return self.model.init({"params": rng, "dropout": rng}, b, b.x,
                               training=False)

    def loss(self, variables, batch, rng, training: bool = True):
        mutable = ["batch_stats"] if "batch_stats" in variables else False
        out = self.model.apply(variables, batch, batch.x, training=training,
                               rngs={"dropout": rng}, mutable=mutable)
        logits, updates = out if mutable else (out, {})
        y = batch.extras["graph_y"]
        mask = batch.extras["graph_mask"]
        logp = jax.nn.log_softmax(logits, axis=-1)
        per = -jnp.take_along_axis(logp, y[:, None], axis=-1).squeeze(-1)
        m = mask.astype(logits.dtype)
        loss = jnp.sum(per * m) / jnp.maximum(jnp.sum(m), 1.0)
        return loss, updates

    def evaluate(self, variables, graph=None) -> Dict[str, jnp.ndarray]:
        out = {}
        for split in ("train", "val", "test"):
            correct = total = 0.0
            for b in self._batches[split]:
                logits = self.model.apply(variables, b, b.x, training=False)
                pred = jnp.argmax(logits, axis=-1)
                m = b.extras["graph_mask"].astype(jnp.float32)
                correct += float(jnp.sum((pred == b.extras["graph_y"]) * m))
                total += float(jnp.sum(m))
            out[f"{split}_acc"] = jnp.asarray(correct / max(total, 1.0))
        return out


class InfoGraphWrapper(GraphClfWrapper):
    """Unsupervised whole-graph representation (reference infograph_mw):
    local-global MI objective on union batches, SVM probe on graph labels."""

    def init(self, rng, graph=None):
        # init through the MI path so the discriminator heads get params
        b = self._batches["train"][0]
        return self.model.init({"params": rng, "dropout": rng}, b, b.x,
                               False, method=self.model.mi_scores)

    def loss(self, variables, batch, rng, training: bool = True):
        mutable = ["batch_stats"] if "batch_stats" in variables else False
        out = self.model.apply(variables, batch, batch.x, training,
                               rngs={"dropout": rng}, mutable=mutable,
                               method=self.model.mi_scores)      # [N, G]
        scores, updates = out if mutable else (out, {})
        graph_id = batch.extras["graph_id"]
        gmask = batch.extras["graph_mask"]
        nmask = batch.node_mask()
        G = scores.shape[1]
        pos = jax.nn.one_hot(graph_id, G, dtype=scores.dtype)
        valid = nmask[:, None] * gmask[None, :].astype(scores.dtype)

        def sp(x):  # softplus
            return jnp.logaddexp(x, 0.0)

        # Jensen-Shannon MI: E_pos[-sp(-T)] - E_neg[sp(T)]
        pos_term = jnp.sum(-sp(-scores) * pos * valid) / jnp.maximum(
            jnp.sum(pos * valid), 1.0)
        neg = (1 - pos) * valid
        neg_term = jnp.sum(sp(scores) * neg) / jnp.maximum(jnp.sum(neg), 1.0)
        return neg_term - pos_term, updates

    def evaluate(self, variables, graph=None):
        from sklearn.model_selection import cross_val_score
        from sklearn.svm import SVC

        embs, labels = [], []
        for split in ("train", "val", "test"):
            for b in self._batches[split]:
                z = np.asarray(self.model.apply(variables, b, b.x,
                                                training=False))
                m = np.asarray(b.extras["graph_mask"])
                embs.append(z[m])
                labels.append(np.asarray(b.extras["graph_y"])[m])
        X = np.concatenate(embs)
        y = np.concatenate(labels)
        X = (X - X.mean(0)) / np.maximum(X.std(0), 1e-8)
        acc = float(np.mean(cross_val_score(SVC(), X, y, cv=3)))
        return {"val_acc": acc, "test_acc": acc}


class PatchySANWrapper:
    """PATCHY-SAN: canonical receptive fields assembled host-side, conv net
    on [G, w, k, F] tensors (reference patchy_san_dw/mw)."""

    eval_metric = "val_acc"
    eval_mode = "max"
    jit_eval = False

    def __init__(self, model, dataset=None, train_ratio: float = 0.7,
                 val_ratio: float = 0.1, seed: int = 0):
        from ..models.nn.patchy_san import assemble_fields

        self.model = model
        graphs, labels = dataset.graphs, np.asarray(dataset.labels)
        fields = assemble_fields(graphs, width=model.width, k=model.k)
        feats = np.zeros(fields.shape + (graphs[0].num_features,), np.float32)
        for i, g in enumerate(graphs):
            xg = np.asarray(g.x)
            feats[i] = xg[fields[i]]
        rng = np.random.default_rng(seed)
        idx = rng.permutation(len(graphs))
        n_tr = int(train_ratio * len(graphs))
        n_va = int(val_ratio * len(graphs))
        self._data = {}
        for split, sl in (("train", idx[:n_tr]),
                          ("val", idx[n_tr: n_tr + n_va]),
                          ("test", idx[n_tr + n_va:])):
            self._data[split] = (jnp.asarray(feats[sl]),
                                 jnp.asarray(labels[sl]))

    def prepare_graph(self, graph):
        return graph

    def train_batches(self, graph=None):
        return [self._data["train"]]

    def init(self, rng, graph=None):
        X, _ = self._data["train"]
        return self.model.init({"params": rng, "dropout": rng}, X,
                               training=False)

    def loss(self, variables, batch, rng, training: bool = True):
        X, y = batch
        logits = self.model.apply(variables, X, training=training,
                                  rngs={"dropout": rng})
        logp = jax.nn.log_softmax(logits, -1)
        return -jnp.mean(jnp.take_along_axis(
            logp, y[:, None].astype(jnp.int32), 1)), {}

    def evaluate(self, variables, graph=None):
        out = {}
        for split in ("train", "val", "test"):
            X, y = self._data[split]
            if X.shape[0] == 0:
                continue
            pred = jnp.argmax(self.model.apply(variables, X, training=False), -1)
            out[f"{split}_acc"] = float(jnp.mean((pred == y)))
        return out
