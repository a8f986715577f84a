"""Heterogeneous wrappers — rebuild of reference heterogeneous_gnn_dw/mw
(HAN/GTN node classification over metapath graphs) and
multiplex_embedding_mw (GATNE: per-edge-type link prediction AUC)."""

from __future__ import annotations

from typing import Dict

import jax.numpy as jnp
import numpy as np

from ..data.graph import Graph
from .node_classification import NodeClfWrapper


class HeterogeneousGNNWrapper(NodeClfWrapper):
    """HAN/GTN: standard masked-CE node classification; the model consumes
    the metapath graphs carried in graph.extras."""

    def prepare_graph(self, graph: Graph) -> Graph:
        return graph  # metapath graphs already prepared; no self-loop rebuild


class MultiplexEmbeddingWrapper:
    """GATNE-style: train per-type embeddings, evaluate ROC-AUC of held-out
    edges per type (reference multiplex_embedding_mw)."""

    def __init__(self, model_name: str, dataset, seed: int = 0,
                 test_ratio: float = 0.2, **model_kwargs):
        from ..models import build_model

        self.model = build_model(model_name, seed=seed, **model_kwargs)
        self.dataset = dataset
        self.seed = seed
        self.test_ratio = test_ratio

    def run_embedding(self) -> Dict[str, float]:
        from sklearn.metrics import roc_auc_score

        graph = self.dataset.graph
        official = getattr(self.dataset, "multiplex_eval", None)
        if official:
            # official valid/test pos+neg pairs (datasets/gatne_data.py):
            # the graph already holds train edges only
            embs = self.model.train_embeddings(graph)
            out, aucs = {}, []
            for t, splits in official.items():
                emb = embs.get(int(t)) if isinstance(embs, dict) else embs
                pos, neg = splits["test"]
                if emb is None or pos.shape[1] < 2 or neg.shape[1] < 2:
                    continue
                sp = (emb[pos[0]] * emb[pos[1]]).sum(1)
                sn = (emb[neg[0]] * emb[neg[1]]).sum(1)
                auc = roc_auc_score(
                    np.r_[np.ones(sp.size), np.zeros(sn.size)], np.r_[sp, sn])
                out[f"auc_type{t}"] = float(auc)
                aucs.append(auc)
            mean_auc = float(np.mean(aucs)) if aucs else 0.0
            out.update({"val_acc": mean_auc, "test_acc": mean_auc,
                        "test_auc": mean_auc})
            return out
        rng = np.random.default_rng(self.seed)
        E = graph.num_edges
        row = np.asarray(graph.row)[:E]
        col = np.asarray(graph.col)[:E]
        etype = (np.asarray(graph.edge_type)[:E]
                 if graph.edge_type is not None else np.zeros(E, np.int64))
        # hold out edges per type
        test_sel = rng.random(E) < self.test_ratio
        from ..data.graph import from_coo

        train_graph = from_coo(
            np.stack([row[~test_sel], col[~test_sel]]),
            num_nodes=graph.num_nodes, edge_type=etype[~test_sel])
        embs = self.model.train_embeddings(train_graph)
        aucs = []
        out = {}
        for t in np.unique(etype):
            emb = embs.get(int(t)) if isinstance(embs, dict) else embs
            if emb is None:
                continue
            sel = test_sel & (etype == t)
            pos_r, pos_c = row[sel], col[sel]
            if pos_r.size < 4:
                continue
            neg_r = rng.integers(0, graph.num_nodes, pos_r.size)
            neg_c = rng.integers(0, graph.num_nodes, pos_r.size)
            sp = (emb[pos_r] * emb[pos_c]).sum(1)
            sn = (emb[neg_r] * emb[neg_c]).sum(1)
            auc = roc_auc_score(np.r_[np.ones(sp.size), np.zeros(sn.size)],
                                np.r_[sp, sn])
            out[f"auc_type{t}"] = float(auc)
            aucs.append(auc)
        mean_auc = float(np.mean(aucs)) if aucs else 0.0
        out.update({"val_acc": mean_auc, "test_acc": mean_auc,
                    "test_auc": mean_auc})
        return out


class GraphEmbeddingWrapper:
    """graph2vec/DGK: whole-graph embeddings + SVM/logreg classification
    (reference graph_embedding_mw, SVM eval)."""

    def __init__(self, model_name: str, dataset, seed: int = 0, **model_kwargs):
        from ..models import build_model

        self.model = build_model(model_name, seed=seed, **model_kwargs)
        self.dataset = dataset
        self.seed = seed

    def run_embedding(self) -> Dict[str, float]:
        from sklearn.model_selection import cross_val_score
        from sklearn.svm import SVC

        graphs = self.dataset.graphs
        labels = np.asarray(self.dataset.labels)
        emb = self.model.train_graph_embeddings(graphs)
        scores = cross_val_score(SVC(), emb, labels, cv=3)
        acc = float(np.mean(scores))
        return {"val_acc": acc, "test_acc": acc, "acc_std": float(np.std(scores))}
