"""Distributed (graph-partitioned) node classification — halo exchange
reachable from the public ``experiment()``/``train()`` API.

The reference makes multi-GPU a Trainer flag (``--distributed``,
cogdl/trainer/trainer.py:253 DDP spawn — data-parallel replicas). The
TPU-native equivalent here is *graph partitioning over a device mesh*:
each chip owns a contiguous destination-node shard, boundary/halo source
rows are exchanged with ONE ``all_to_all`` per source-side gather
(``ops.spmm.source_table``), and the whole train step — model forward,
loss, backward, optimizer — runs inside a single ``shard_map`` region that
XLA compiles once for the mesh (SURVEY §2.8 "TPU-native equivalent").

Any spmm/gather-based flax model works unchanged (GCN, GAT, SAGE, APPNP …)
because the halo exchange lives UNDER the ops dispatch: the partitioned
graph's ``col`` uses extended-local indices and carries its send tables in
``extras`` (parallel/halo.py ``partition_graph_halo``).

Usage::

    experiment(dataset="sbm", model="gcn", wrapper="distributed",
               n_devices=8)
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from ..data.graph import Graph
from ..parallel.halo import AXIS, partition_graph_halo
from .node_classification import NodeClfWrapper


def _local(stacked: Graph) -> Graph:
    """Strip the leading unit shard dim inside shard_map."""
    return jax.tree.map(lambda a: a[0], stacked)


class DistributedNodeClfWrapper(NodeClfWrapper):
    """Full-batch node classification over a graph-partitioned device mesh."""

    jit_eval = False

    def __init__(self, model, dataset=None, n_devices: int = 0,
                 seed: int = 0):
        super().__init__(model, dataset)
        self.n_devices = n_devices or len(jax.devices())
        if len(jax.devices()) < self.n_devices:
            raise ValueError(
                f"n_devices={self.n_devices} but only {len(jax.devices())} "
                "devices are visible (tests: set "
                "xla_force_host_platform_device_count)")
        self.mesh = jax.make_mesh((self.n_devices,), (AXIS,))

    def prepare_graph(self, graph: Graph) -> Graph:
        from ..data.graph import add_self_loops, sym_norm

        graph = sym_norm(add_self_loops(graph))
        stacked = partition_graph_halo(graph, self.n_devices)
        # keep a host copy for single-shard init, then shard the leading dim
        self._g0 = jax.tree.map(lambda a: np.asarray(a)[0], stacked)
        sh = jax.NamedSharding(self.mesh, P(AXIS))
        return jax.tree.map(lambda a: jax.device_put(a, sh), stacked)

    def init(self, rng, stacked: Graph):
        g0 = self._g0
        return self.model.init({"params": rng, "dropout": rng}, g0, g0.x,
                               training=False)

    def _shard_loss(self, variables, stacked, rng, training):
        def local_loss(params, g_stacked):
            g = _local(g_stacked)
            logits = self.model.apply(
                {"params": params}, g, g.x, training=training,
                rngs={"dropout": rng})
            mask = (g.train_mask & g.extras["real_node"]).astype(
                logits.dtype)
            logp = jax.nn.log_softmax(logits.astype(jnp.float32), -1)
            y = jnp.clip(g.y, 0, logits.shape[-1] - 1)
            per = -jnp.take_along_axis(logp, y[:, None], 1)[:, 0]
            s = jax.lax.psum(jnp.sum(per * mask), AXIS)
            c = jax.lax.psum(jnp.sum(mask), AXIS)
            return s / jnp.maximum(c, 1.0)

        fn = jax.shard_map(
            local_loss, mesh=self.mesh, in_specs=(P(), P(AXIS)),
            out_specs=P(), check_vma=False)
        return fn(variables["params"], stacked)

    def loss(self, variables, stacked: Graph, rng, training: bool = True):
        return self._shard_loss(variables, stacked, rng, training), {}

    def evaluate(self, variables, stacked: Graph) -> Dict[str, float]:
        def local_logits(params, g_stacked):
            g = _local(g_stacked)
            out = self.model.apply({"params": params}, g, g.x,
                                   training=False)
            return out[None]

        fn = jax.jit(jax.shard_map(
            local_logits, mesh=self.mesh, in_specs=(P(), P(AXIS)),
            out_specs=P(AXIS), check_vma=False))
        logits = np.asarray(fn(variables["params"], stacked))  # [P, Nl, C]
        pred = logits.argmax(-1).reshape(-1)
        y = np.asarray(stacked.y).reshape(-1)
        real = np.asarray(stacked.extras["real_node"]).reshape(-1)
        out = {}
        for split in ("train", "val", "test"):
            m = getattr(stacked, f"{split}_mask")
            if m is None:
                continue
            mm = np.asarray(m).reshape(-1) & real
            if mm.sum() == 0:
                continue
            out[f"{split}_acc"] = float((pred[mm] == y[mm]).mean())
        return out
