"""Attributed graph clustering wrapper — rebuild of reference
gae_mw/agc_mw/daegc_mw (cogdl/wrappers/model_wrapper/clustering/): train a
(V)GAE-style encoder by edge reconstruction, cluster embeddings with KMeans,
report NMI / clustering accuracy-F1 (wrapper_utils.evaluate_clustering:268).
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from ..data.graph import Graph, add_self_loops


class ClusteringWrapper:
    eval_metric = "val_nmi"
    eval_mode = "max"
    jit_eval = False

    def __init__(self, model, dataset=None, n_clusters: int = 0,
                 num_neg: int = 4):
        self.model = model
        self.dataset = dataset
        self.n_clusters = n_clusters
        self.num_neg = num_neg

    def prepare_graph(self, graph: Graph) -> Graph:
        return add_self_loops(graph)

    def train_batches(self, graph):
        return [graph]

    def init(self, rng, graph: Graph):
        return self.model.init({"params": rng, "dropout": rng}, graph, graph.x,
                               training=False)

    def loss(self, variables, graph: Graph, rng, training: bool = True):
        r1, r2 = jax.random.split(rng)
        z = self.model.apply(variables, graph, graph.x, training,
                             rngs={"dropout": r1})
        pos = self.model.apply(variables, z, graph.row, graph.col,
                               method=self.model.decode_edges)
        nr = jax.random.randint(r2, (graph.e_pad,), 0, graph.num_nodes)
        nc = jax.random.randint(jax.random.fold_in(r2, 1), (graph.e_pad,), 0,
                                graph.num_nodes)
        neg = self.model.apply(variables, z, nr, nc,
                               method=self.model.decode_edges)
        m = graph.edge_mask().astype(pos.dtype)

        def bce(logit, target):
            return jnp.maximum(logit, 0) - logit * target + jnp.log1p(
                jnp.exp(-jnp.abs(logit)))

        loss = (jnp.sum(bce(pos, 1.0) * m) + jnp.sum(bce(neg, 0.0) * m)) / (
            jnp.maximum(2 * m.sum(), 1.0))
        if getattr(self.model, "has_kl", False):
            loss = loss + self.model.apply(
                variables, graph, graph.x, method=self.model.kl,
            ) / jnp.maximum(float(graph.num_nodes), 1.0)
        return loss, {}

    def evaluate(self, variables, graph: Graph) -> Dict[str, float]:
        from sklearn.cluster import KMeans
        from sklearn.metrics import normalized_mutual_info_score

        z = np.asarray(self.model.apply(variables, graph, graph.x,
                                        method=self.model.embed))
        mask = np.asarray(graph.node_mask())
        y = np.asarray(graph.y)[mask]
        k = self.n_clusters or (int(y.max()) + 1)
        pred = KMeans(n_clusters=k, n_init=4, random_state=0).fit_predict(
            z[mask])
        nmi = normalized_mutual_info_score(y, pred)
        return {"val_nmi": nmi, "test_nmi": nmi}
