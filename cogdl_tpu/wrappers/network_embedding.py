"""Network-embedding wrapper — rebuild of reference network_embedding_mw
(cogdl/wrappers/model_wrapper/node_classification/network_embedding_mw.py:10):
train a shallow embedding on the whole graph, evaluate with the shuffled
logreg/liblinear micro/macro-F1 protocol (90% labels).
"""

from __future__ import annotations

from typing import Dict

import numpy as np

from ..models import build_model
from ..utils.probe import f1_label_probe, logreg_probe


class NetworkEmbeddingWrapper:
    def __init__(self, model_name: str, dataset, seed: int = 0,
                 training_percents=(0.9,), **model_kwargs):
        self.model = build_model(model_name, seed=seed, **model_kwargs)
        self.dataset = dataset
        self.seed = seed
        self.training_percents = training_percents

    def run_embedding(self) -> Dict[str, float]:
        graph = self.dataset.graph
        emb = self.model.train_embeddings(graph)
        y = np.asarray(graph.y)[: graph.num_nodes]
        if graph.train_mask is not None and y.ndim == 1:
            out = logreg_probe(
                np.concatenate([emb, np.zeros((graph.n_pad - emb.shape[0],
                                               emb.shape[1]), emb.dtype)]),
                graph)
        else:
            out = f1_label_probe(emb, y, train_ratio=self.training_percents[0],
                                 seed=self.seed)
            out["test_acc"] = out["test_micro_f1"]
        out["val_acc"] = out.get("val_acc", out.get("test_acc", 0.0))
        return out
