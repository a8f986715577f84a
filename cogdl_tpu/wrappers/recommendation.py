"""Recommendation wrapper: LightGCN + BPR loss + Recall/NDCG@k eval
(reference rec_data.py datasets + lightgcn training loop)."""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from ..data.graph import Graph


class RecommendationWrapper:
    eval_metric = "val_recall"
    eval_mode = "max"
    jit_eval = False

    def __init__(self, model, dataset=None, num_neg: int = 1, topk: int = 20,
                 seed: int = 0):
        self.model = model
        self.dataset = dataset
        self.topk = topk
        self.seed = seed

    def prepare_graph(self, graph: Graph) -> Graph:
        self.num_users = graph.meta_get("num_users")
        self.num_items = graph.num_nodes - self.num_users
        E = graph.num_edges
        row = np.asarray(graph.row)[:E]
        col = np.asarray(graph.col)[:E]
        ui = row < self.num_users
        self._user_pos = {}
        for u, i in zip(row[ui], col[ui]):
            self._user_pos.setdefault(int(u), set()).add(int(i))

        official = getattr(self.dataset, "eval_user_items", None)
        if official:
            # official test positives (datasets/rec.py): the graph already
            # holds train interactions only — nothing to remove
            self._eval_pos = {
                int(u): np.asarray(items, np.int64) + self.num_users
                for u, items in official.items() if len(items)}
            return graph

        # fallback: hold out the last item per user — and REMOVE those
        # interactions from the training graph (they must be invisible to
        # both the BPR positive sampling and the LightGCN propagation, or
        # the evaluation measures memorisation of training edges)
        self._eval_pos = {}
        for u, items in self._user_pos.items():
            if len(items) > 1:
                it = sorted(items)[-1]
                self._eval_pos[u] = np.asarray([it], np.int64)
                items.discard(it)
        held = {(u, int(i[0])) for u, i in self._eval_pos.items()}
        keep = np.ones(E, bool)
        for e in range(E):
            r, c = int(row[e]), int(col[e])
            if (r, c) in held or (c, r) in held:
                keep[e] = False
        if not keep.all():
            from ..data.graph import from_coo

            graph = from_coo(
                np.stack([row[keep], col[keep]]),
                num_nodes=graph.num_nodes,
                n_pad=graph.n_pad, e_pad=graph.e_pad, bucket=False,
                meta=dict(graph.meta))
        return graph

    def train_batches(self, graph):
        return [graph]

    def init(self, rng, graph: Graph):
        return self.model.init({"params": rng}, graph)

    def loss(self, variables, graph: Graph, rng, training: bool = True):
        emb = self.model.apply(variables, graph)
        r2, r3 = jax.random.split(rng)
        B = 4096
        # positive items sampled from edges of each user via random edge pick
        eidx = jax.random.randint(r2, (B,), 0, graph.num_edges)
        users = graph.row[eidx]
        pos = graph.col[eidx]
        neg = jax.random.randint(
            r3, (B,), self.num_users, self.num_users + self.num_items)
        # keep only user→item edges
        valid = (users < self.num_users).astype(emb.dtype)
        ue, pe, ne = emb[users], emb[pos], emb[neg]
        pos_s = jnp.sum(ue * pe, -1)
        neg_s = jnp.sum(ue * ne, -1)
        bpr = -jax.nn.log_sigmoid(pos_s - neg_s)
        reg = 1e-4 * (jnp.sum(ue ** 2) + jnp.sum(pe ** 2) + jnp.sum(ne ** 2)) / B
        return jnp.sum(bpr * valid) / jnp.maximum(valid.sum(), 1.0) + reg, {}

    def evaluate(self, variables, graph: Graph) -> Dict[str, float]:
        emb = np.asarray(self.model.apply(variables, graph))
        users = sorted(self._eval_pos)
        if not users:
            return {"val_recall": 0.0, "test_recall": 0.0}
        U = emb[users]
        items = emb[self.num_users: self.num_users + self.num_items]
        scores = U @ items.T
        recall, ndcg = 0.0, 0.0
        discounts = 1.0 / np.log2(np.arange(2, self.topk + 2))
        for idx, u in enumerate(users):
            seen = np.asarray(sorted(self._user_pos.get(u, ())), np.int64)
            if seen.size:
                scores[idx, seen - self.num_users] = -1e30
            top = np.argsort(-scores[idx])[: self.topk]
            targets = self._eval_pos[u] - self.num_users
            rel = np.isin(top, targets)
            recall += rel.sum() / targets.size
            ideal = discounts[: min(targets.size, top.size)].sum()
            ndcg += (rel * discounts[: top.size]).sum() / ideal
        n = len(users)
        return {"val_recall": recall / n, "test_recall": recall / n,
                "val_ndcg": ndcg / n, "test_ndcg": ndcg / n}
