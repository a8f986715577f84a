"""Device mesh + graph sharding — the TPU-native replacement for the
reference's DDP/NCCL stack (cogdl/trainer/trainer.py:253-301).

Strategy (SURVEY.md §2.8 TPU-native equivalent): there is no process-group
code at all. We lay out a 1-D ``Mesh`` over an axis named ``"graph"``,
annotate node- and edge-arrays as sharded along it, and let GSPMD insert the
collectives (all-gather of source features for the cross-shard gather,
reduce-scatter for the segment-sum) over ICI. Parameters stay replicated;
gradient all-reduce falls out of jit's partitioning.

The explicit shard_map halo-exchange path (edge-partitioned CSR with
ppermute'd boundary features) lives in cogdl_tpu.parallel.halo.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..data.graph import Graph

GRAPH_AXIS = "graph"


def make_mesh(n_devices: Optional[int] = None, axis: str = GRAPH_AXIS) -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (axis,))


def replicate(mesh: Mesh, tree):
    sh = NamedSharding(mesh, P())
    return jax.tree.map(lambda a: jax.device_put(a, sh), tree)


def shard_graph(graph: Graph, mesh: Mesh, axis: str = GRAPH_AXIS) -> Graph:
    """Place the graph with node arrays and edge arrays sharded along the mesh
    axis (destination-contiguous edge order makes the edge shards align with
    node shards for the dominant segment-sum direction).

    Pads static shapes up so every axis divides the mesh size.
    """
    n = mesh.devices.size
    from ..data.graph import pad_to, _round_up

    # Pallas SpMM layouts (graph.extras, from ops.pallas.prepare_spmm) are
    # single-chip edge orderings — they neither shard along the mesh axis nor
    # survive the re-pad below. Drop them: the GSPMD path aggregates through
    # the XLA segment-op tier; the kernel tier on multichip goes through the
    # explicit shard_map halo path (parallel.halo.prepare_shard_layouts).
    if graph.extras:
        kept = {k: v for k, v in graph.extras.items()
                if not k.startswith("spmm_")}
        graph = graph.replace(extras=kept or None)

    n_pad = _round_up(graph.n_pad, n)
    e_pad = _round_up(graph.e_pad, n)
    if n_pad != graph.n_pad or e_pad != graph.e_pad:
        graph = pad_to(graph, n_pad, e_pad)

    node_sh = NamedSharding(mesh, P(axis))
    edge_sh = NamedSharding(mesh, P(axis))
    repl = NamedSharding(mesh, P())

    def put(a, sh):
        return None if a is None else jax.device_put(a, sh)

    return graph.replace(
        row_ptr=put(graph.row_ptr, repl),
        row=put(graph.row, edge_sh),
        col=put(graph.col, edge_sh),
        edge_weight=put(graph.edge_weight, edge_sh),
        edge_attr=put(graph.edge_attr, edge_sh),
        edge_type=put(graph.edge_type, edge_sh),
        x=put(graph.x, node_sh),
        y=put(graph.y, node_sh),
        train_mask=put(graph.train_mask, node_sh),
        val_mask=put(graph.val_mask, node_sh),
        test_mask=put(graph.test_mask, node_sh),
    )


def shard_expert_params(mesh: Mesh, variables, num_experts: int,
                        axis: str = GRAPH_AXIS, match: str = "moe"):
    """Expert parallelism: place expert-major weight tensors ([E, ...] leaves
    under modules whose path contains ``match``) sharded along the mesh axis,
    everything else replicated. GSPMD then runs each device's expert slice
    locally and inserts the psum over the expert axis — the TPU-native
    FastMoE story (reference models/nn/moe_gcn.py wraps FastMoE's NCCL
    experts)."""
    from jax.sharding import PartitionSpec as P

    def place(path, a):
        if (match in jax.tree_util.keystr(path)
                and getattr(a, "ndim", 0) >= 1 and a.shape[0] == num_experts):
            spec = P(axis, *([None] * (a.ndim - 1)))
            return jax.device_put(a, NamedSharding(mesh, spec))
        return jax.device_put(a, NamedSharding(mesh, P()))

    return jax.tree_util.tree_map_with_path(place, variables)
