"""Self-supervised node wrappers: DGI and GRACE.

Rebuild of reference dgi_mw / grace_mw (cogdl/wrappers/model_wrapper/
node_classification/{dgi_mw,grace_mw}.py): train the encoder with the
self-supervised objective, then evaluate by logistic-regression probing of
frozen embeddings (wrapper_utils.evaluate_node_embeddings_using_logreg).
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from ..data.graph import Graph, add_self_loops
from ..utils.probe import logreg_probe


class DGIWrapper:
    eval_metric = "val_acc"
    eval_mode = "max"
    jit_eval = False

    def __init__(self, model, dataset=None):
        self.model = model
        self.dataset = dataset

    def prepare_graph(self, graph: Graph) -> Graph:
        return add_self_loops(graph)

    def train_batches(self, graph):
        return [graph]

    def init(self, rng, graph: Graph):
        # init through the loss path so every submodule (encoder AND
        # discriminator) gets parameters
        return self.model.init({"params": rng, "dropout": rng}, graph, graph.x,
                               graph.x, False, method=self.model.infomax_logits)

    def loss(self, variables, graph: Graph, rng, training: bool = True):
        r1, r2 = jax.random.split(rng)
        # permute REAL nodes only: pad rows are all-zero, and shuffling them
        # in would hand the discriminator trivially separable negatives
        n = graph.num_nodes
        perm = jnp.concatenate([
            jax.random.permutation(r1, n),
            jnp.arange(n, graph.x.shape[0])])
        x_corrupt = graph.x[perm]
        pos, neg = self.model.apply(
            variables, graph, graph.x, x_corrupt, training,
            rngs={"dropout": r2}, method=self.model.infomax_logits)
        m = graph.node_mask().astype(pos.dtype)
        # BCE: positives → 1, negatives → 0
        def bce(logit, target):
            return jnp.maximum(logit, 0) - logit * target + jnp.log1p(
                jnp.exp(-jnp.abs(logit)))
        loss = jnp.sum((bce(pos, 1.0) + bce(neg, 0.0)) * m) / jnp.maximum(
            2 * m.sum(), 1.0)
        return loss, {}

    def evaluate(self, variables, graph: Graph) -> Dict[str, jnp.ndarray]:
        emb = self.model.apply(variables, graph, graph.x,
                               method=self.model.embed)
        return logreg_probe(np.asarray(emb), graph)


class GRACEWrapper(DGIWrapper):
    def init(self, rng, graph: Graph):
        def init_all(model):
            h = model.encode(graph, graph.x, False)
            return model.project(h)

        return self.model.init({"params": rng, "dropout": rng},
                               method=init_all)

    def loss(self, variables, graph: Graph, rng, training: bool = True):
        r1, r2, r3 = jax.random.split(rng, 3)
        z1 = self.model.apply(variables, graph, graph.x, r1, 0, training,
                              rngs={"dropout": r3}, method=self.model.view)
        z2 = self.model.apply(variables, graph, graph.x, r2, 1, training,
                              rngs={"dropout": r3}, method=self.model.view)
        h1 = self.model.apply(variables, z1, method=self.model.project)
        h2 = self.model.apply(variables, z2, method=self.model.project)
        mask = graph.node_mask()
        l1 = self.model.apply(variables, h1, h2, mask, method=self.model.nt_xent)
        l2 = self.model.apply(variables, h2, h1, mask, method=self.model.nt_xent)
        return 0.5 * (l1 + l2), {}

    def evaluate(self, variables, graph: Graph) -> Dict[str, jnp.ndarray]:
        emb = self.model.apply(variables, graph, graph.x, False,
                               method=self.model.encode)
        return logreg_probe(np.asarray(emb), graph)


class GraphMAEWrapper(DGIWrapper):
    """Masked-autoencoder pretraining + logreg probe (BASELINE.json config 5:
    GraphMAE self-supervised pretrain + linear probe)."""

    def init(self, rng, graph: Graph):
        return self.model.init(
            {"params": rng, "dropout": rng}, graph, graph.x, rng, False,
            method=self.model.reconstruction_loss)

    def loss(self, variables, graph: Graph, rng, training: bool = True):
        r1, r2 = jax.random.split(rng)
        loss = self.model.apply(variables, graph, graph.x, r1, training,
                                rngs={"dropout": r2},
                                method=self.model.reconstruction_loss)
        return loss, {}


class UnsupGraphSAGEWrapper(DGIWrapper):
    """Unsupervised GraphSAGE: random-walk co-occurrence positives + uniform
    negatives with the sigmoid loss (reference unsup_graphsage_mw and
    UnsupNeighborSamplerDataset, data/sampler.py:119-185). Walks are sampled
    host-side per epoch (native C++ when built) and enter the jitted step as
    batch arrays — static shapes, no retrace."""

    walk_length = 3
    num_negatives = 8
    pairs_per_epoch = 2048
    refresh_per_epoch = True

    def prepare_graph(self, graph: Graph) -> Graph:
        graph = super().prepare_graph(graph)
        from ..data.sampling import graph_csr

        self._csr = graph_csr(graph)
        self._rng_np = np.random.default_rng(0)
        return graph

    def init(self, rng, graph: Graph):
        return self.model.init({"params": rng, "dropout": rng}, graph,
                               graph.x, training=False)

    def train_batches(self, graph: Graph):
        from .. import native

        indptr, indices, _ = self._csr
        rng_np = self._rng_np
        starts = rng_np.integers(0, graph.num_nodes, self.pairs_per_epoch)
        if native.available():
            walks = native.random_walk(indptr, indices, starts,
                                       self.walk_length,
                                       seed=int(rng_np.integers(0, 2 ** 62)))
        else:
            from ..models.emb.walks import random_walks as _rw

            walks = _rw(indptr, indices, 1, self.walk_length,
                        seed=int(rng_np.integers(0, 2 ** 31)))[starts]
        neg = rng_np.integers(0, graph.num_nodes,
                              (starts.shape[0], self.num_negatives))
        return [(graph, jnp.asarray(starts), jnp.asarray(walks[:, -1]),
                 jnp.asarray(neg))]

    def loss(self, variables, batch, rng, training: bool = True):
        graph, u, v, neg = batch
        z = self.model.apply(variables, graph, graph.x, training,
                             rngs={"dropout": rng})
        zu, zv, zn = z[u], z[v], z[neg]
        pos = jnp.sum(zu * zv, -1)
        negs = jnp.einsum("bd,bkd->bk", zu, zn)
        loss = -jnp.mean(jax.nn.log_sigmoid(pos)) - jnp.mean(
            jax.nn.log_sigmoid(-negs))
        return loss, {}

    def evaluate(self, variables, graph: Graph):
        emb = self.model.apply(variables, graph, graph.x, False)
        return logreg_probe(np.asarray(emb), graph)
