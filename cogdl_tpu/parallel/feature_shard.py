"""Feature-sharded (papers100M-class) sampled training.

SURVEY §7 hard part 3: ogbn-papers100M has a 111M x 128 f32 feature matrix
(~57 GB) that cannot exist replicated on any single chip — the table must be
sharded across the mesh and sampled rows fetched with collectives inside the
jitted step. The reference registers papers100M
(cogdl/datasets/ogb.py:1-80) but has no way to train it full- or
mini-batch without a full replica per worker; this module is the capability
the reference never had.

Design (shard_map over one mesh axis, default ``"graph"``):

* ``shard_rows(table, mesh)`` rounds the row count up to a multiple of P and
  places the table with ``P(axis)`` row sharding — each device owns exactly
  ``rows/P`` contiguous rows and NO replica exists anywhere.
* ``gather_sharded_rows(table_local, idx, axis)`` — inside ``shard_map``:
  every device gathers the requested rows it owns (one LOCAL gather over its
  shard), zeros elsewhere, and one ``psum`` reassembles the full ``[M, F]``
  result on every device. Comm = (P-1)/P · M·F·4 bytes per device — the
  frontier size, never the table size.
* ``gather_sharded_rows_dp(table_local, idx, axis)`` — the data-parallel
  variant where every device requests a DIFFERENT ``[M]`` index set (its own
  minibatch frontier): ``all_gather`` the index sets (tiny), answer all P
  requests from the local shard, and ``psum_scatter`` routes each device its
  own rows — the all_to_all pattern, same O(M·F) comm.

Both primitives are plain differentiable jax: the VJP scatters grads back to
the owning shard through the transposed collective automatically.

The same primitive shards the CSR column table by EDGE ranges, so sampling
itself also runs without a full edge-list replica (papers100M: 1.6B edges =
6.4 GB int32 — too big to replicate next to activations):
``sample_blocks_device_sharded``.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

AXIS = "graph"

__all__ = ["shard_rows", "gather_sharded_rows", "gather_sharded_rows_dp",
           "sample_blocks_device_sharded", "sharded_frame_features"]


def shard_rows(table: jnp.ndarray, mesh, axis: str = AXIS):
    """Place ``table`` with its rows sharded over ``mesh[axis]`` (padding the
    row count up to a multiple of the axis size). Returns the sharded array;
    each device holds exactly ``ceil(rows/P)`` rows and no full copy exists.
    """
    P_ = mesh.shape[axis]
    rows = table.shape[0]
    pad = (-rows) % P_
    if pad:
        table = jnp.concatenate(
            [table, jnp.zeros((pad,) + table.shape[1:], table.dtype)])
    return jax.device_put(table, NamedSharding(mesh, P(axis)))


def gather_sharded_rows(table_local: jnp.ndarray, idx: jnp.ndarray,
                        axis: str = AXIS) -> jnp.ndarray:
    """[M, ...] rows of the row-sharded table, for a REPLICATED ``[M]`` index
    vector. Call inside ``shard_map``; ``table_local`` is this device's
    ``[Nl, ...]`` shard."""
    Nl = table_local.shape[0]
    me = jax.lax.axis_index(axis)
    lo = me * Nl
    local = idx - lo
    owned = (local >= 0) & (local < Nl)
    rows = jnp.take(table_local, jnp.clip(local, 0, Nl - 1), axis=0,
                    mode="clip")
    rows = jnp.where(
        owned.reshape((-1,) + (1,) * (rows.ndim - 1)), rows, 0)
    return jax.lax.psum(rows, axis)


def gather_sharded_rows_dp(table_local: jnp.ndarray, idx: jnp.ndarray,
                           axis: str = AXIS) -> jnp.ndarray:
    """Per-device index sets (data parallelism): each device passes its OWN
    ``[M]`` ids and receives its own ``[M, F]`` rows. all_gather(idx) is
    P·M·4 bytes; the row payload moves once via psum_scatter."""
    Nl = table_local.shape[0]
    me = jax.lax.axis_index(axis)
    lo = me * Nl
    idx_all = jax.lax.all_gather(idx, axis)              # [P, M]
    local = idx_all - lo
    owned = (local >= 0) & (local < Nl)
    rows = jnp.take(table_local, jnp.clip(local, 0, Nl - 1).reshape(-1),
                    axis=0, mode="clip")
    rows = rows.reshape(idx_all.shape + rows.shape[1:])  # [P, M, F]
    rows = jnp.where(
        owned.reshape(owned.shape + (1,) * (rows.ndim - 2)), rows, 0)
    # sum over devices, route slice p to device p
    flat = rows.reshape((-1,) + rows.shape[2:])          # [P*M, F]
    return jax.lax.psum_scatter(flat, axis, scatter_dimension=0, tiled=True)


def sample_blocks_device_sharded(
    row_ptr: jnp.ndarray,
    col_local: jnp.ndarray,
    graph_meta: dict,
    seeds: jnp.ndarray,
    key: jnp.ndarray,
    fanouts: Sequence[int],
    axis: str = AXIS,
    dp: bool = True,
):
    """Fanout sampling where the CSR column table is EDGE-sharded across the
    mesh (no full edge-list replica). Mirrors
    ``data.device_sampling.sample_blocks_device`` (same no-dedup frontier
    plan, same block structure) but every ``col`` gather goes through
    :func:`gather_sharded_rows_dp` (or the replicated variant when
    ``dp=False``).

    ``row_ptr`` stays replicated ([N+1] int32 — 0.4 GB at papers100M scale,
    cheap next to the 57 GB feature table). ``graph_meta`` needs
    ``num_nodes``, ``n_pad``, ``e_tab`` (padded edge count = P·El).

    Returns ``(blocks, frame)`` exactly like the single-chip sampler, except
    ``blocks[0].extras`` has no resident ``x_table`` — fetch frame features
    with :func:`sharded_frame_features`.
    """
    from ..data.device_sampling import plan_sizes
    from ..data.graph import Graph, _bucket

    gather = gather_sharded_rows_dp if dp else gather_sharded_rows
    fanouts = tuple(int(f) for f in fanouts)
    B = int(seeds.shape[0])
    sizes = plan_sizes(B, fanouts)
    S = sizes[-1]
    n_pad = _bucket(S + 1)
    sink = n_pad - 1
    g_sink = graph_meta["n_pad"] - 1
    e_tab = graph_meta["e_tab"]

    cur = seeds.astype(jnp.int32)
    alive_per_hop: List[jnp.ndarray] = []
    for k, f in enumerate(fanouts):
        n = sizes[k]
        ptr = jnp.take(row_ptr, cur, mode="clip")
        deg = jnp.take(row_ptr, cur + 1, mode="clip") - ptr
        key, sub = jax.random.split(key)
        u = jax.random.uniform(sub, (n, f))
        off = jnp.minimum(
            (u * deg[:, None].astype(jnp.float32)).astype(jnp.int32),
            jnp.maximum(deg[:, None] - 1, 0))
        pos = jnp.minimum(ptr[:, None] + off, e_tab - 1)
        src = gather(col_local, pos.reshape(-1), axis).reshape(n, f)
        alive = deg > 0
        src = jnp.where(alive[:, None], src, cur[:, None])
        alive_per_hop.append(alive)
        cur = jnp.concatenate([cur, src.reshape(-1)])

    frame = jnp.concatenate(
        [cur, jnp.full((n_pad - S,), g_sink, jnp.int32)])

    blocks: List[Graph] = []
    for k in reversed(range(len(fanouts))):
        f = fanouts[k]
        n = sizes[k]
        e_real = n * f
        e_pad = _bucket(e_real)
        rows = np.full(e_pad, sink, np.int32)
        rows[:e_real] = np.repeat(np.arange(n, dtype=np.int32), f)
        base_cols = sizes[k] + np.arange(e_real, dtype=np.int32)
        rp = (np.minimum(np.arange(n_pad + 1, dtype=np.int64), n) * f
              ).astype(np.int32)
        rp[-1] = e_pad
        alive_e = jnp.repeat(alive_per_hop[k], f)
        cols = jnp.where(alive_e, jnp.asarray(base_cols), sink)
        cols = jnp.concatenate(
            [cols, jnp.full((e_pad - e_real,), sink, jnp.int32)])
        w = jnp.concatenate(
            [alive_e.astype(jnp.float32),
             jnp.zeros((e_pad - e_real,), jnp.float32)])
        meta = {"fanout": f, "frontier": n}
        if graph_meta.get("num_classes") is not None:
            meta["num_classes"] = graph_meta["num_classes"]
        blocks.append(Graph(
            row_ptr=jnp.asarray(rp), row=jnp.asarray(rows), col=cols,
            edge_weight=w, num_nodes=S, num_edges=e_real,
            meta=tuple(sorted(meta.items())),
        ))
    return tuple(blocks), frame


def sharded_frame_features(x_local: jnp.ndarray, frame: jnp.ndarray,
                           axis: str = AXIS, dp: bool = True) -> jnp.ndarray:
    """Frame features from the row-sharded table: one collective gather of
    exactly the frame rows. The table never leaves its shards."""
    gather = gather_sharded_rows_dp if dp else gather_sharded_rows
    return gather(x_local, frame, axis)
