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
