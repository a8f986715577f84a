"""GNN link prediction wrapper — rebuild of reference gnn_link_prediction_dw/mw
(cogdl/wrappers/*/link_prediction): hold out a fraction of edges, train a GNN
encoder with dot-product edge scoring + negative sampling, evaluate ROC-AUC.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from ..data.graph import Graph, add_self_loops, from_coo


class LinkPredictionWrapper:
    eval_metric = "val_auc"
    eval_mode = "max"
    jit_eval = False

    def __init__(self, model, dataset=None, test_ratio: float = 0.1,
                 val_ratio: float = 0.05, seed: int = 0):
        self.model = model
        self.dataset = dataset
        self.test_ratio = test_ratio
        self.val_ratio = val_ratio
        self.seed = seed
        self._split_done = False

    def prepare_graph(self, graph: Graph) -> Graph:
        """Edge split: remove val/test edges from the training graph."""
        official = getattr(self.dataset, "link_split", None)
        if official:
            # official OGB-style eval pairs (datasets/ogb.py build_link):
            # the graph already holds training edges only
            rng = np.random.default_rng(self.seed)
            self._eval_edges = {}
            for split in ("val", "test"):
                pos, neg = official.get(
                    "valid" if split == "val" else split, (None, None))
                if pos is None:
                    continue
                pos = np.asarray(pos).reshape(-1, 2) if pos.shape[0] != 2 \
                    else np.asarray(pos).T
                if neg is None:
                    neg = rng.integers(0, graph.num_nodes,
                                       size=(len(pos), 2))
                else:
                    neg = np.asarray(neg).reshape(-1, 2) if neg.shape[0] != 2 \
                        else np.asarray(neg).T
                self._eval_edges[split] = (pos, neg)
            return add_self_loops(graph)
        rng = np.random.default_rng(self.seed)
        E = graph.num_edges
        row = np.asarray(graph.row)[:E]
        col = np.asarray(graph.col)[:E]
        # undirected split on canonical (min,max) pairs
        pairs = np.unique(np.stack([np.minimum(row, col),
                                    np.maximum(row, col)], 1), axis=0)
        perm = rng.permutation(pairs.shape[0])
        n_te = int(self.test_ratio * pairs.shape[0])
        n_va = int(self.val_ratio * pairs.shape[0])
        te = pairs[perm[:n_te]]
        va = pairs[perm[n_te: n_te + n_va]]
        tr = pairs[perm[n_te + n_va:]]

        def negatives(n):
            neg = rng.integers(0, graph.num_nodes, size=(int(1.2 * n) + 8, 2))
            key = set(map(tuple, pairs.tolist()))
            out = [p for p in neg.tolist() if tuple(sorted(p)) not in key
                   and p[0] != p[1]]
            return np.asarray(out[:n], np.int64)

        self._eval_edges = {
            "val": (va, negatives(len(va))),
            "test": (te, negatives(len(te))),
        }
        new_row = np.concatenate([tr[:, 0], tr[:, 1]])
        new_col = np.concatenate([tr[:, 1], tr[:, 0]])
        g = from_coo(
            np.stack([new_row, new_col]), num_nodes=graph.num_nodes,
            x=None if graph.x is None else np.asarray(graph.x)[: graph.num_nodes],
            y=None if graph.y is None else np.asarray(graph.y)[: graph.num_nodes],
            meta=dict(graph.meta),
        )
        self._train_pairs = tr
        return add_self_loops(g)

    def train_batches(self, graph):
        return [graph]

    def init(self, rng, graph: Graph):
        return self.model.init({"params": rng, "dropout": rng}, graph, graph.x,
                               training=False)

    def _encode(self, variables, graph, training, rng=None):
        rngs = {"dropout": rng} if rng is not None else {}
        return self.model.apply(variables, graph, graph.x, training=training,
                                rngs=rngs)

    def loss(self, variables, graph: Graph, rng, training: bool = True):
        r1, r2 = jax.random.split(rng)
        z = self._encode(variables, graph, training, r1)
        E = graph.num_edges
        pos = jnp.sum(z[graph.row] * z[graph.col], axis=-1)
        nr = jax.random.randint(r2, (graph.e_pad,), 0, graph.num_nodes)
        nc = jax.random.randint(jax.random.fold_in(r2, 1), (graph.e_pad,), 0,
                                graph.num_nodes)
        neg = jnp.sum(z[nr] * z[nc], axis=-1)
        m = graph.edge_mask().astype(pos.dtype)

        def bce(logit, target):
            return jnp.maximum(logit, 0) - logit * target + jnp.log1p(
                jnp.exp(-jnp.abs(logit)))

        loss = (jnp.sum(bce(pos, 1.0) * m) + jnp.sum(bce(neg, 0.0) * m)) / (
            jnp.maximum(2.0 * m.sum(), 1.0))
        return loss, {}

    def evaluate(self, variables, graph: Graph) -> Dict[str, float]:
        from sklearn.metrics import roc_auc_score

        z = np.asarray(self._encode(variables, graph, False))
        out = {}
        for split, (pos, neg) in self._eval_edges.items():
            if len(pos) == 0 or len(neg) == 0:
                continue
            sp = (z[pos[:, 0]] * z[pos[:, 1]]).sum(-1)
            sn = (z[neg[:, 0]] * z[neg[:, 1]]).sum(-1)
            ytrue = np.r_[np.ones(len(sp)), np.zeros(len(sn))]
            out[f"{split}_auc"] = float(roc_auc_score(ytrue, np.r_[sp, sn]))
        return out
