"""On-device neighbor sampling — fanout sampling as a pure XLA program over
the HBM-resident CSR.

TPU-native replacement for the host sampling pipeline (data/sampling.py
``NeighborSampler``, itself a rebuild of reference cogdl/data/sampler.py:62-117
plus the C++ ``sample_adj`` in cogdl/operators/sample/sample.cpp). The host
path keeps the chip fed the reference way — CPU workers + prefetch — but on a
remote/tunneled TPU each batch ships ~8 MB of block structure, capping sampled
training at ~7 s/step regardless of compute. Here the CSR
(``graph.row_ptr``/``graph.col``: destination-major, sources in ``col``) stays
resident in HBM and a batch ships ONLY a ``[B]`` int32 seed array (~4 KB);
sampling, frame feature/label gathers and the train step all trace into ONE
jitted program. An epoch can further ``lax.scan`` over ``[n_batches, B]`` seed
arrays so a whole epoch costs a single dispatch (see ``bench.py --sampled
--device-sampler``).

Design deltas vs the host sampler (each is what makes the program XLA-native):

* **No frontier dedup.** Frontiers grow as exact concatenations
  ``cur_{k+1} = [cur_k, src_k]`` — the host path's padded upper bound
  (``layer_sizes``) becomes the EXACT static size, so no ``unique`` /
  ``searchsorted`` (which have no fixed-shape XLA form) is needed. Duplicate
  frame rows recompute what padding rows would have wasted anyway: device
  memory and FLOPs match the padded host batch.
* **Sampling is with replacement** (the reference ``sample_adj`` default) via
  one ``uniform [n, fanout]`` draw per hop. Zero-degree destinations get all
  slots pointed at the frame sink row (zero features, zero weight), so their
  mean/sum aggregate is 0 — identical to the host path, which drops those
  edges.
* **Blocks come out outermost-first**: ``blocks[i]`` is consumed by layer
  ``i`` (GraphSAGE contract), and layer 0 needs the LARGEST frontier — the
  hop sampled last. ``fanouts[k]`` is the fanout used at expansion hop ``k``
  (seeds outward), matching the host sampler.
* **Block structure is compile-time constant.** Every destination has exactly
  ``fanout`` slots, so ``row``/``row_ptr`` are iota ramps and ``col`` is a
  ramp masked by per-hop liveness; only the frame (sampled global ids) and
  the gathers are data-dependent. XLA folds the structure into the program.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .graph import Graph, _bucket

__all__ = ["plan_sizes", "sample_blocks_device", "DeviceNeighborSampler"]


def plan_sizes(batch_size: int, fanouts: Sequence[int]) -> List[int]:
    """Exact frontier size after each expansion hop (no dedup):
    ``sizes[k+1] = sizes[k] * (fanouts[k] + 1)``."""
    sizes = [int(batch_size)]
    for f in fanouts:
        sizes.append(sizes[-1] * (int(f) + 1))
    return sizes


def sample_blocks_device(
    graph: Graph,
    seeds: jnp.ndarray,
    key: jnp.ndarray,
    fanouts: Sequence[int],
) -> Tuple[Tuple[Graph, ...], jnp.ndarray]:
    """Jittable multi-hop fanout sampling over the resident CSR.

    Returns ``(blocks, frame)``: ``blocks`` are statically shaped bipartite
    Graphs over one shared node frame (outermost-first, one per layer);
    ``frame`` is the padded ``int32[n_pad]`` global-id array whose first
    ``len(seeds)`` rows are the seeds. ``blocks[0]`` carries the gather
    extras (``frame`` + resident ``x_table``) plus SEED-row labels and train
    mask (``seed_y``/``seed_train_mask``, ``[B]``-sized — the loss slices
    logits to the seed rows, so full-frame label streams never exist).
    """
    fanouts = tuple(int(f) for f in fanouts)
    B = int(seeds.shape[0])
    sizes = plan_sizes(B, fanouts)
    S = sizes[-1]
    n_pad = _bucket(S + 1)
    sink = n_pad - 1
    g_sink = graph.n_pad - 1  # feature-table sink row (zeros)

    row_ptr_g, col_g = graph.row_ptr, graph.col
    e_tab = int(col_g.shape[0])
    cur = seeds.astype(jnp.int32)
    alive_per_hop: List[jnp.ndarray] = []
    for k, f in enumerate(fanouts):
        n = sizes[k]
        ptr = jnp.take(row_ptr_g, cur, mode="clip")
        deg = jnp.take(row_ptr_g, cur + 1, mode="clip") - ptr
        key, sub = jax.random.split(key)
        u = jax.random.uniform(sub, (n, f))
        off = jnp.minimum((u * deg[:, None].astype(jnp.float32)).astype(jnp.int32),
                          jnp.maximum(deg[:, None] - 1, 0))
        pos = jnp.minimum(ptr[:, None] + off, e_tab - 1)
        src = jnp.take(col_g, pos.reshape(-1), mode="clip").reshape(n, f)
        alive = deg > 0
        # dead destinations: keep the frontier well-formed by expanding around
        # the node itself (the host sampler does the same before masking)
        src = jnp.where(alive[:, None], src, cur[:, None])
        alive_per_hop.append(alive)
        cur = jnp.concatenate([cur, src.reshape(-1)])

    frame = jnp.concatenate(
        [cur, jnp.full((n_pad - S,), g_sink, jnp.int32)])

    # labels/masks only for the SEED rows (the loss never reads deeper frame
    # rows; full-frame [n_pad] gathers + masks cost 1-2 ms each at B=1024 —
    # the 1-D T(1024) layout penalty, scripts/profile_sampled.py)
    seed_ids = frame[:B]
    y_f = tm_f = None
    if graph.y is not None:
        y_f = jnp.take(graph.y, seed_ids, axis=0, mode="clip")
    if graph.train_mask is not None:
        tm_f = jnp.take(graph.train_mask, seed_ids, mode="clip")

    blocks: List[Graph] = []
    for k in reversed(range(len(fanouts))):
        f = fanouts[k]
        n = sizes[k]
        e_real = n * f
        e_pad = _bucket(e_real)
        # static structure (host constants folded by XLA)
        rows = np.full(e_pad, sink, np.int32)
        rows[:e_real] = np.repeat(np.arange(n, dtype=np.int32), f)
        base_cols = sizes[k] + np.arange(e_real, dtype=np.int32)
        rp = (np.minimum(np.arange(n_pad + 1, dtype=np.int64), n) * f
              ).astype(np.int32)
        rp[-1] = e_pad  # pad edges live in the sink row (from_coo contract)
        # dynamic: dead slots point at the frame sink (zero features)
        alive_e = jnp.repeat(alive_per_hop[k], f)
        cols = jnp.where(alive_e, jnp.asarray(base_cols), sink)
        cols = jnp.concatenate(
            [cols, jnp.full((e_pad - e_real,), sink, jnp.int32)])
        w = jnp.concatenate(
            [alive_e.astype(jnp.float32),
             jnp.zeros((e_pad - e_real,), jnp.float32)])
        meta = {"fanout": f, "frontier": n}
        if graph.meta_get("num_classes") is not None:
            meta["num_classes"] = graph.num_classes
        blocks.append(Graph(
            row_ptr=jnp.asarray(rp), row=jnp.asarray(rows), col=cols,
            edge_weight=w, num_nodes=S, num_edges=e_real,
            # static regular-fanout meta: every real dst has EXACTLY f slots
            # in dst-major order, so aggregation reduces a [n, f, F] reshape
            # instead of running a segment scatter (ops.aggregate fast path)
            meta=tuple(sorted(meta.items())),
        ))

    blocks[0] = blocks[0].replace(
        extras={"frame": frame, "x_table": graph.x,
                "seed_y": y_f, "seed_train_mask": tm_f})
    return tuple(blocks), frame


class DeviceNeighborSampler:
    """Epoch driver for the device sampler: shuffles the train ids on host
    (numpy — a [N_train] permutation, not graph work) and yields ``[B]`` seed
    arrays; everything else happens on device inside the consumer's jit."""

    def __init__(self, graph: Graph, fanouts: Sequence[int],
                 batch_size: int = 512, seed: int = 0,
                 node_idx=None):
        self.graph = graph
        self.fanouts = tuple(int(f) for f in fanouts)
        self.batch_size = int(batch_size)
        self.rng = np.random.default_rng(seed)
        if node_idx is None:
            node_idx = np.nonzero(
                np.asarray(graph.train_mask)[: graph.num_nodes])[0]
        self.node_idx = np.asarray(node_idx, np.int32)
        if self.node_idx.size == 0:
            raise ValueError(
                "DeviceNeighborSampler: no seed nodes (empty train mask and "
                "no node_idx given)")

    def __len__(self):
        return (len(self.node_idx) + self.batch_size - 1) // self.batch_size

    def epoch_seeds(self, shuffle: bool = True) -> np.ndarray:
        """``[n_batches, B]`` int32 seed matrix (wrap-padded last batch)."""
        idx = self.node_idx.copy()
        if shuffle:
            self.rng.shuffle(idx)
        B = self.batch_size
        nb = len(self)
        out = np.empty((nb, B), np.int32)
        for i in range(nb):
            chunk = idx[i * B: (i + 1) * B]
            if chunk.shape[0] < B:
                chunk = np.concatenate([chunk, idx[: B - chunk.shape[0]]])
            out[i] = chunk
        return out
