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


class DeviceSampledNodeClfWrapper(NodeClfWrapper):
    """Neighbor-sampled training with ON-DEVICE sampling: the resident CSR is
    sampled inside the jitted train step (data/device_sampling.py), so a batch
    ships only a ``[B]`` seed array instead of ~8 MB of block structure — the
    TPU-native answer to the reference's C++ sampler + DataLoader workers
    (cogdl/data/sampler.py:62-117, operators/sample/sample.cpp). Evaluation is
    full-batch, as in the host-sampled wrapper."""

    refresh_per_epoch = True

    def __init__(self, model, dataset=None, fanouts=(10, 10),
                 batch_size: int = 256, seed: int = 0):
        super().__init__(model, dataset)
        self.fanouts = tuple(int(f) for f in fanouts)
        self.batch_size = int(batch_size)
        self.seed = seed
        self._sampler = None

    def prepare_graph(self, graph: Graph) -> Graph:
        graph = super().prepare_graph(graph)
        from ..data.device_sampling import DeviceNeighborSampler

        self._sampler = DeviceNeighborSampler(
            graph, self.fanouts, batch_size=self.batch_size, seed=self.seed)
        return graph

    def train_batches(self, graph: Graph):
        # per-batch payload: the resident graph (already committed on device,
        # rides the pytree as an argument — no transfer) + one seed row
        return [{"graph": graph, "seeds": jnp.asarray(row)}
                for row in self._sampler.epoch_seeds()]

    # Trainer epoch-scan protocol: the whole epoch (sampling included) runs
    # inside ONE jitted lax.scan over the [n_batches, B] seed matrix — one
    # dispatch + one readback per epoch
    def epoch_xs(self, graph: Graph):
        return jnp.asarray(self._sampler.epoch_seeds())

    def make_batch(self, graph: Graph, x):
        return {"graph": graph, "seeds": x}

    def _forward(self, variables, graph, seeds, sample_key, drop_key,
                 training, mutable):
        from ..data.device_sampling import sample_blocks_device

        blocks, _ = sample_blocks_device(graph, seeds, sample_key,
                                         self.fanouts)
        x = jnp.take(blocks[0].extras["x_table"], blocks[0].extras["frame"],
                     axis=0, mode="clip")
        out = self.model.apply(variables, list(blocks), x, training=training,
                               rngs={"dropout": drop_key}, mutable=mutable)
        return blocks, out

    def loss(self, variables, batch, rng, training: bool = True):
        sample_key, drop_key = jax.random.split(rng)
        mutable = ["batch_stats"] if "batch_stats" in variables else False
        blocks, out = self._forward(variables, batch["graph"], batch["seeds"],
                                    sample_key, drop_key, training, mutable)
        logits, updates = out if mutable else (out, {})
        B = self.batch_size
        # seed rows only: logits[:B] + the [B]-sized label/mask extras (the
        # deeper frame rows never enter the loss — avoids [n_pad] streams)
        ex = blocks[0].extras
        mask = (ex["seed_train_mask"] if ex["seed_train_mask"] is not None
                else jnp.ones((B,), bool))
        return masked_cross_entropy(logits[:B], ex["seed_y"], mask), updates

    def init(self, rng, graph: Graph):
        from ..data.device_sampling import sample_blocks_device

        seeds = jnp.asarray(self._sampler.epoch_seeds(shuffle=False)[0])
        blocks, _ = sample_blocks_device(
            graph, seeds, jax.random.PRNGKey(self.seed), self.fanouts)
        x = jnp.take(blocks[0].extras["x_table"], blocks[0].extras["frame"],
                     axis=0, mode="clip")
        return self.model.init({"params": rng, "dropout": rng}, list(blocks),
                               x, training=False)


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


class GraphSAINTWrapper(NodeClfWrapper):
    """GraphSAINT: subgraph-sampled training with the UNBIASED estimator —
    pre-sampling estimation of node/edge inclusion counts feeding the
    ``norm_loss`` loss weights and ``norm_aggr`` aggregation rescaling
    (reference cogdl/models/nn/graphsaint.py:133 ``_loss``; the estimation
    itself follows the original GraphSAINT minibatch code, which the
    reference never wired in — the model ships the hook, nothing computes
    the coefficients).

    Estimator: draw ``est_samples`` subgraphs with the training sampler,
    count node inclusions C_v and edge inclusions C_e. Then
      norm_loss[v]  ∝ 1 / C_v   (normalised so Σ over train nodes = N_train)
      norm_aggr[e]  = C_dst(e) / C_e  (rescales each subgraph edge weight so
                      E[Ã x] over subgraph draws equals the full-graph A x)
    Samplers: ``node`` (uniform node set) and ``walk`` (random-walk roots),
    from data/sampling.py saint_*_subgraph.
    """

    refresh_per_epoch = True

    def __init__(self, model, dataset=None, sampler: str = "walk",
                 sample_size: int = 1024, walk_roots: int = 128,
                 walk_length: int = 4, batches_per_epoch: int = 8,
                 est_samples: int = 40, seed: int = 0):
        super().__init__(model, dataset)
        self.sampler = sampler
        self.sample_size = sample_size
        self.walk_roots = walk_roots
        self.walk_length = walk_length
        self.batches_per_epoch = batches_per_epoch
        self.est_samples = est_samples
        self.seed = seed
        self._epoch = 0

    def _draw(self, graph: Graph, rng) -> np.ndarray:
        from ..data.sampling import saint_node_subgraph, saint_walk_subgraph

        if self.sampler == "walk":
            return saint_walk_subgraph(graph, self.walk_roots,
                                       self.walk_length, rng)
        return saint_node_subgraph(
            graph, min(self.sample_size, graph.num_nodes), rng)

    def prepare_graph(self, graph: Graph) -> Graph:
        graph = super().prepare_graph(graph)
        # the model's sym_norm runs on the FULL graph; subgraphs inherit the
        # normalised weights (rescaled by norm_aggr), per the SAINT estimator
        from ..data.graph import sym_norm

        graph = sym_norm(graph)
        E = graph.num_edges
        self._row = np.asarray(graph.row)[:E]
        self._col = np.asarray(graph.col)[:E]
        self._w = np.asarray(graph.edge_weight)[:E]
        rng = np.random.default_rng(self.seed)
        cv = np.zeros(graph.num_nodes, np.int64)
        ce = np.zeros(E, np.int64)
        max_n = max_e = 1
        for _ in range(self.est_samples):
            nodes = self._draw(graph, rng)
            sel = np.zeros(graph.num_nodes, bool)
            sel[nodes] = True
            em = sel[self._row] & sel[self._col]
            cv[nodes] += 1
            ce += em
            max_n = max(max_n, len(nodes))
            max_e = max(max_e, int(em.sum()))
        self._shape_hint = (max_n, max_e)
        nl = 1.0 / np.maximum(cv, 1)
        tr = np.asarray(graph.train_mask)[: graph.num_nodes]
        denom = max(float(nl[tr].sum()), 1e-12)
        self._norm_loss = (nl * tr.sum() / denom).astype(np.float32)
        self._norm_aggr = (np.maximum(cv[self._row], 1)
                           / np.maximum(ce, 1)).astype(np.float32)
        self._norm_aggr = np.minimum(self._norm_aggr, self.est_samples)
        return graph

    def _subgraph(self, graph: Graph, nodes: np.ndarray) -> Graph:
        from ..data.graph import from_coo

        nodes = np.sort(nodes)
        sel = np.zeros(graph.num_nodes, bool)
        sel[nodes] = True
        em = sel[self._row] & sel[self._col]
        relabel = np.full(graph.num_nodes, -1, np.int64)
        relabel[nodes] = np.arange(len(nodes))
        r, c = relabel[self._row[em]], relabel[self._col[em]]
        w = self._w[em] * self._norm_aggr[em]
        xs = np.asarray(graph.x)[nodes]
        y = np.asarray(graph.y)[nodes]
        tm = np.asarray(graph.train_mask)[nodes]
        g = from_coo(np.stack([r, c]), num_nodes=len(nodes), edge_weight=w,
                     x=xs, y=y, train_mask=tm, meta=dict(graph.meta))
        extras = dict(g.extras or {})
        nlw = np.zeros(g.n_pad, np.float32)
        nlw[: len(nodes)] = self._norm_loss[nodes]
        extras["norm_loss"] = jnp.asarray(nlw)
        return g.replace(extras=extras)

    def train_batches(self, graph: Graph) -> List[Graph]:
        rng = np.random.default_rng(self.seed + 1000 * self._epoch + 1)
        self._epoch += 1
        return [self._subgraph(graph, self._draw(graph, rng))
                for _ in range(self.batches_per_epoch)]

    def loss(self, variables, batch: Graph, rng, training: bool = True):
        mutable = ["batch_stats"] if "batch_stats" in variables else False
        out = self.model.apply(variables, batch, batch.x, training=training,
                               rngs={"dropout": rng}, mutable=mutable)
        logits, updates = out if mutable else (out, {})
        mask = (batch.train_mask & batch.node_mask()).astype(jnp.float32)
        logp = jax.nn.log_softmax(logits, -1)
        ce = -jnp.take_along_axis(logp, batch.y[:, None], 1)[:, 0]
        w = batch.extras["norm_loss"] * mask
        # norm_loss-weighted sum (graphsaint.py:140), scaled by 1/N_train so
        # the lr is comparable to the mean-CE wrappers
        loss = jnp.sum(ce * w) / jnp.maximum(jnp.sum(mask), 1.0)
        return loss, updates
