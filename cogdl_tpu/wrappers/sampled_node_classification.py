"""Sampled mini-batch node classification: GraphSAGE neighbor-sampling and
ClusterGCN training.

Rebuild of reference graphsage_dw/mw (cogdl/wrappers/*/graphsage_*.py:
NeighborSampler train batches, full-graph eval) and cluster_dw
(cluster_dw.py:5-43, METIS→BFS partition batches).
"""

from __future__ import annotations

from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np

from ..data.graph import Graph, add_self_loops
from ..data.sampling import ClusterLoader, NeighborSampler
from ..utils.evaluator import masked_accuracy, masked_cross_entropy
from .node_classification import NodeClfWrapper


class SampledNodeClfWrapper(NodeClfWrapper):
    """Neighbor-sampled training; full-batch evaluation (the reference uses
    layer-wise inference for huge graphs — full-batch here; the layered
    variant comes with the OGB-scale path)."""

    refresh_per_epoch = True

    def __init__(self, model, dataset=None, fanouts=(10, 10),
                 batch_size: int = 256, seed: int = 0,
                 device_features: bool = False):
        super().__init__(model, dataset)
        self.fanouts = list(fanouts)
        self.batch_size = batch_size
        self.seed = seed
        self.device_features = device_features
        self._sampler = None
        self._epoch = 0

    def prepare_graph(self, graph: Graph) -> Graph:
        graph = super().prepare_graph(graph)
        self._sampler = NeighborSampler(
            graph, self.fanouts, batch_size=self.batch_size, seed=self.seed,
            device_features=self.device_features)
        return graph

    def _block_x(self, blocks):
        if blocks[0].x is not None:
            return blocks[0].x
        # resident feature table + frame index ride the batch pytree
        # (sampling.py NeighborSampler device_features)
        return jnp.take(blocks[0].extras["x_table"],
                        blocks[0].extras["frame"], axis=0, mode="clip")

    def train_batches(self, graph: Graph):
        self._epoch += 1

        def gen():
            # the seed nodes are the first `batch_size` rows of each frame
            for blocks, frame, seeds in self._sampler.epoch():
                yield tuple(blocks)

        # background-thread sampling + device_put pipeline keeps the chip fed
        from ..data.sampling import Prefetcher

        return Prefetcher(gen)

    def loss(self, variables, batch, rng, training: bool = True):
        blocks = list(batch)
        mutable = ["batch_stats"] if "batch_stats" in variables else False
        out = self.model.apply(variables, blocks, self._block_x(blocks),
                               training=training, rngs={"dropout": rng},
                               mutable=mutable)
        logits, updates = out if mutable else (out, {})
        y = blocks[0].y
        B = self.batch_size
        mask = jnp.zeros(logits.shape[0], bool).at[:B].set(True)
        if blocks[0].train_mask is not None:
            # frame rows past the (deduped) seeds are sampled neighbors —
            # only train-split nodes may contribute to the loss
            mask = mask & blocks[0].train_mask
        loss = masked_cross_entropy(logits, y, mask)
        return loss, updates

    def init(self, rng, graph: Graph):
        # sample one shape-defining batch directly (no Prefetcher: abandoning
        # its iterator mid-epoch would park a worker thread holding device
        # batches for the whole run, and bump the epoch/RNG state)
        blocks, _, _ = next(self._sampler.epoch(shuffle=False))
        return self.model.init({"params": rng, "dropout": rng}, blocks,
                               self._block_x(blocks), training=False)


class ClusterNodeClfWrapper(NodeClfWrapper):
    """ClusterGCN: BFS-partition subgraph batches
    (reference cluster_dw.py ClusterWrapper)."""

    refresh_per_epoch = True

    def __init__(self, model, dataset=None, n_clusters: int = 20,
                 cluster_batch: int = 5, seed: int = 0):
        super().__init__(model, dataset)
        self.n_clusters = n_clusters
        self.cluster_batch = cluster_batch
        self.seed = seed
        self._loader = None

    def prepare_graph(self, graph: Graph) -> Graph:
        graph = super().prepare_graph(graph)
        self._loader = ClusterLoader(graph, n_clusters=self.n_clusters,
                                     batch_size=self.cluster_batch,
                                     seed=self.seed)
        return graph

    def train_batches(self, graph: Graph):
        from ..data.sampling import Prefetcher

        return Prefetcher(self._loader.epoch)

    def loss(self, variables, batch: Graph, rng, training: bool = True):
        mutable = ["batch_stats"] if "batch_stats" in variables else False
        out = self.model.apply(variables, batch, batch.x, training=training,
                               rngs={"dropout": rng}, mutable=mutable)
        logits, updates = out if mutable else (out, {})
        mask = batch.train_mask & batch.node_mask()
        return masked_cross_entropy(logits, batch.y, mask), updates
