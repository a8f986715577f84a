"""Explicit graph-partitioned distributed SpMM via shard_map — the
"context parallelism" of GNNs (SURVEY.md §5: partition CSR by destination
node, exchange boundary/halo source features with collectives, overlap with
local aggregation).

Two exchange strategies over the mesh axis:
  * ``all_gather`` (default): gather all source-feature shards, then local
    gather + segment-sum. Right when features-per-shard are small or the
    graph is dense across shards; one big ICI collective XLA can overlap.
  * ring (``ppermute``): stream neighbor shards around the ring, accumulating
    the partial SpMM restricted to sources owned by the visiting shard —
    peak memory O(N/P) instead of O(N), bandwidth identical, and each step's
    ppermute overlaps the previous step's compute (ring-attention style).

Host-side ``partition_graph`` produces equal-shape per-shard arrays (stacked
on a leading mesh axis) so the whole thing jits once.
"""

from __future__ import annotations

from functools import partial
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..data.graph import Graph

AXIS = "graph"


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def shard_assignment(graph: Graph, n_shards: int,
                     method: str = "contiguous", seed: int = 0):
    """Node → shard assignment with within-shard local ids.

    ``contiguous``: ``part = id // Nl`` (the original split — pathological
    on real power-law graphs: shard 0 gets every hub).
    ``bfs``: degree-weighted BFS-grown balanced partition
    (:func:`cogdl_tpu.data.sampling.bfs_partition`, the METIS replacement —
    reference sampler.py:188-245) — per-shard IN-degree sums are balanced so
    the padded edge count ``El = max_p edges(p)`` stays near the mean.

    Returns ``(part[N], local[N], Nl)`` with the invariant that the
    relabeled global id ``gid = part·Nl + local`` is unique, so collective
    code (all_gather tables, ring ownership tests) works unchanged on
    ``gid``-indexed columns.
    """
    N = graph.num_nodes
    if method == "contiguous":
        Nl = _round_up(graph.n_pad, n_shards) // n_shards
        ids = np.arange(N, dtype=np.int64)
        part = ids // Nl
        return part, ids - part * Nl, Nl
    if method != "bfs":
        raise ValueError(f"unknown partition method {method!r}")
    from ..data.sampling import bfs_partition

    part = bfs_partition(graph, n_shards, seed=seed, weights="degree")
    counts = np.bincount(part, minlength=n_shards)
    offsets = np.zeros(n_shards + 1, np.int64)
    np.cumsum(counts, out=offsets[1:])
    order = np.argsort(part, kind="stable")
    ranks = np.empty(N, np.int64)
    ranks[order] = np.arange(N)
    local = ranks - offsets[part]
    Nl = _round_up(int(counts.max()) if N else 1, 8)
    return part, local, Nl


def _gather_shard_nodes(a, node_list, fill=0):
    """node-data array → [P, Nl, ...] per-shard rows via an id gather
    (node_list[p, i] = global id of shard p's i-th node, -1 on padding)."""
    if a is None:
        return None
    a = np.asarray(a)
    P_, Nl = node_list.shape
    out = np.full((P_, Nl) + a.shape[1:], fill, a.dtype)
    valid = node_list >= 0
    out[valid] = a[node_list[valid]]
    return out


def partition_graph(graph: Graph, n_shards: int,
                    method: str = "contiguous",
                    seed: int = 0) -> Dict[str, np.ndarray]:
    """Destination-node partition → stacked per-shard arrays.

    Returns dict of numpy arrays with leading dim ``n_shards``:
      x[P, Nl, F], y[P, Nl], train_mask[P, Nl],
      row_local[P, El] (dst relative to shard), col[P, El] (gid src:
      ``part·Nl + local`` — equals the raw global id for ``contiguous``),
      w[P, El], edge_mask implicit via w=0 padding.
    """
    E = graph.num_edges
    row = np.asarray(graph.row)[:E]
    col = np.asarray(graph.col)[:E]
    w = np.asarray(graph.edge_weight)[:E]
    part, local, Nl = shard_assignment(graph, n_shards, method, seed)
    shard_of = part[row]
    gid = part * Nl + local

    counts = np.bincount(shard_of, minlength=n_shards)
    El = _round_up(int(counts.max()) if E else 1, 8)

    # pad edge slots point at the LAST local row (w=0) so row_l stays
    # nondecreasing — the consumers pass indices_are_sorted=True
    row_l = np.full((n_shards, El), Nl - 1, np.int32)
    col_g = np.zeros((n_shards, El), np.int32)
    w_s = np.zeros((n_shards, El), np.float32)
    for p in range(n_shards):
        sel = np.nonzero(shard_of == p)[0]
        k = sel.shape[0]
        rl = local[row[sel]]
        # keep per-shard edges dst-sorted: the consumers pass
        # indices_are_sorted=True to segment_sum
        order = np.argsort(rl, kind="stable")
        row_l[p, :k] = rl[order]
        col_g[p, :k] = gid[col[sel[order]]]
        w_s[p, :k] = w[sel[order]]

    node_list = np.full((n_shards, Nl), -1, np.int64)
    node_list[part, local] = np.arange(graph.num_nodes)

    nmask = np.zeros(graph.n_pad, bool)
    nmask[: graph.num_nodes] = True
    return {
        "x": _gather_shard_nodes(graph.x, node_list),
        "y": _gather_shard_nodes(graph.y, node_list),
        "train_mask": _gather_shard_nodes(graph.train_mask, node_list, False),
        "node_mask": _gather_shard_nodes(nmask, node_list, False),
        "row_local": row_l,
        "col": col_g,
        "w": w_s,
        "edge_counts": counts.astype(np.int64),
        "n_local": Nl,
        "n_shards": n_shards,
    }


def halo_spmm_allgather(x_local, row_local, col_global, w, axis: str = AXIS):
    """Inside shard_map: out_local = A_local @ all_gather(x)."""
    xg = jax.lax.all_gather(x_local, axis, tiled=True)      # [N, F]
    msg = jnp.take(xg, col_global, axis=0, mode="clip") * w[:, None]
    return jax.ops.segment_sum(msg, row_local,
                               num_segments=x_local.shape[0],
                               indices_are_sorted=True)


def prepare_shard_layouts(parts: Dict) -> Dict:
    """Host-side: per-shard Pallas sorted-segment layouts for the kernel-tier
    local aggregation (stacked on the shard axis, padded to a common chunk
    count so the whole thing keeps one static shape per array).

    Extends ``parts`` with ``lay_col/lay_w/lay_row/lay_ct [P, ...]`` and
    ``n_local_pad``. Destination rows are shard-local; source columns stay
    global (they index the all-gathered feature matrix).
    """
    from ..ops.pallas.segment_kernels import (
        R_TILE, T_CHUNK, build_spmm_layout)

    n_shards, Nl = parts["n_shards"], parts["n_local"]
    n_local_pad = _round_up(Nl, R_TILE)
    n_tiles = n_local_pad // R_TILE

    layouts = []
    counts = parts.get("edge_counts")
    for p in range(n_shards):
        w = parts["w"][p]
        # explicit per-shard edge count (a real edge may carry weight 0 —
        # counting nonzeros would silently drop tail edges)
        k = (int(counts[p]) if counts is not None
             else int(np.count_nonzero(w)))
        layouts.append(build_spmm_layout(
            parts["row_local"][p][:k], parts["col"][p][:k], w[:k],
            n_local_pad))

    n_chunks = max(l["chunk_tile"].shape[0] for l in layouts)
    E_k = n_chunks * T_CHUNK
    col = np.zeros((n_shards, E_k), np.int32)
    wk = np.zeros((n_shards, E_k), np.float32)
    rowk = np.zeros((n_shards, E_k), np.int32)
    ct = np.zeros((n_shards, n_chunks), np.int32)
    for p, l in enumerate(layouts):
        e, c = l["col_k"].shape[0], l["chunk_tile"].shape[0]
        col[p, :e] = l["col_k"]
        wk[p, :e] = l["w_k"]
        rowk[p, :e] = l["row_k"]
        ct[p, :c] = l["chunk_tile"]
        # pad chunks must keep chunk_tile monotonic: point them at the last
        # REAL tile of this shard (their w == 0, so they accumulate nothing)
        last_tile = int(l["chunk_tile"][-1]) if c else 0
        ct[p, c:] = last_tile
        rowk[p, e:] = last_tile * R_TILE

    parts = dict(parts)
    parts.update(lay_col=col, lay_w=wk, lay_row=rowk, lay_ct=ct,
                 n_local_pad=n_local_pad)
    return parts


def halo_spmm_allgather_kernel(x_local, lay_col, lay_w, lay_row, lay_ct,
                               n_local_pad: int, axis: str = AXIS):
    """Kernel-tier variant of :func:`halo_spmm_allgather`: all-gather the
    feature shards over ICI, then aggregate locally through the Pallas
    sorted-segment MXU kernel instead of an XLA scatter. Call inside
    shard_map with per-shard layout arrays from :func:`prepare_shard_layouts`,
    and pass ``check_vma=False`` to shard_map (pallas_call outputs carry no
    varying-mesh-axes annotation).
    """
    from ..ops.pallas.segment_kernels import F_BLK, segment_sum_pallas

    xg = jax.lax.all_gather(x_local, axis, tiled=True)        # [N, F]
    F = xg.shape[1]
    if F % F_BLK != 0:
        xg = jnp.pad(xg, ((0, 0), (0, F_BLK - F % F_BLK)))
    msg = jnp.take(xg, lay_col, axis=0, mode="clip")
    if msg.dtype != jnp.float32:
        msg = msg.astype(jnp.float32)
    # grads flow: d(msg) = gather(ct, lay_row)·w (segment_sum_pallas VJP),
    # then XLA differentiates the take into a scatter-add over xg and the
    # all_gather into a psum-scatter back to the owner shard.
    out = segment_sum_pallas(msg, lay_row, lay_w, lay_ct, n_local_pad)
    out = out[: x_local.shape[0], :F].astype(x_local.dtype)
    return out


def halo_spmm_ring(x_local, row_local, col_global, w, axis: str = AXIS):
    """Ring variant: visit each source shard via ppermute, accumulate the
    partial aggregation of edges whose source lives on the visiting shard.
    Peak memory O(N/P); ppermute of the next shard overlaps this step's
    gather+segment-sum under XLA latency hiding."""
    P_ = jax.lax.axis_size(axis)
    me = jax.lax.axis_index(axis)
    Nl = x_local.shape[0]
    perm = [(i, (i + 1) % P_) for i in range(P_)]

    def body(k, carry):
        acc, buf = carry
        owner = (me - k) % P_                 # whose shard is in buf
        sel = (col_global // Nl) == owner
        local_idx = jnp.where(sel, col_global - owner * Nl, 0)
        msg = jnp.take(buf, local_idx, axis=0, mode="clip") * jnp.where(sel, w, 0.0)[:, None]
        acc = acc + jax.ops.segment_sum(
            msg, row_local, num_segments=Nl, indices_are_sorted=True)
        buf = jax.lax.ppermute(buf, axis, perm)
        return acc, buf

    acc = jnp.zeros_like(x_local)
    acc, _ = jax.lax.fori_loop(0, P_, body, (acc, x_local))
    return acc


def make_halo_train_step(mesh: Mesh, parts: Dict, model_apply, tx,
                         num_classes: int, exchange: str = "ring"):
    """Build a jitted distributed GCN-style train step over explicit shards.

    ``model_apply(params, spmm_fn, x_local) -> logits_local`` lets any
    2-layer-style model plug its dense math around the distributed spmm.
    Gradients are averaged with psum inside shard_map.
    """
    spmm_fn = halo_spmm_ring if exchange == "ring" else halo_spmm_allgather

    Nl = parts["n_local"]

    def loss_local(params, x, y, tmask, nmask, row_l, col_g, w):
        sp = partial(spmm_fn, row_local=row_l, col_global=col_g, w=w)
        logits = model_apply(params, sp, x)
        logp = jax.nn.log_softmax(logits, axis=-1)
        y_safe = jnp.clip(y, 0, num_classes - 1).astype(jnp.int32)
        per = -jnp.take_along_axis(logp, y_safe[:, None], axis=1).squeeze(-1)
        m = (tmask & nmask).astype(logits.dtype)
        loss_sum = jnp.sum(per * m)
        cnt = jnp.sum(m)
        # global mean via psum
        loss_sum = jax.lax.psum(loss_sum, AXIS)
        cnt = jax.lax.psum(cnt, AXIS)
        return loss_sum / jnp.maximum(cnt, 1.0)

    from jax import shard_map

    @jax.jit
    def train_step(params, opt_state, x, y, tmask, nmask, row_l, col_g, w):
        def sharded(params, x, y, tmask, nmask, row_l, col_g, w, opt_state):
            loss, grads = jax.value_and_grad(loss_local)(
                params, x, y, tmask, nmask, row_l, col_g, w)
            grads = jax.lax.pmean(grads, AXIS)
            upd, opt_state2 = tx.update(grads, opt_state, params)
            return optax_apply(params, upd), opt_state2, loss

        import optax as _optax

        def optax_apply(p, u):
            return _optax.apply_updates(p, u)

        fn = shard_map(
            sharded, mesh=mesh,
            in_specs=(P(), P(AXIS), P(AXIS), P(AXIS), P(AXIS), P(AXIS),
                      P(AXIS), P(AXIS), P()),
            out_specs=(P(), P(), P()),
        )
        return fn(params, x, y, tmask, nmask, row_l, col_g, w, opt_state)

    return train_step


def device_put_parts(mesh: Mesh, parts: Dict):
    """Place the stacked per-shard arrays with their leading dim sharded."""
    sh = NamedSharding(mesh, P(AXIS))
    out = {}
    for k, v in parts.items():
        if isinstance(v, np.ndarray):
            out[k] = jax.device_put(jnp.asarray(v).reshape((-1,) + v.shape[2:]),
                                    sh)
        else:
            out[k] = v
    return out


# ---------------------------------------------------------------------------
# Boundary-only halo exchange (round-2): per-shard unique halo index sets
# built at partition time; only boundary features cross the ICI
# ---------------------------------------------------------------------------

def partition_graph_halo(graph: Graph, n_shards: int,
                         axis: str = AXIS, method: str = "bfs",
                         seed: int = 0) -> "Graph":
    """Contiguous destination partition with EXTENDED-local column indexing
    and per-pair halo send tables — comm volume O(boundary), not O(N).

    Returns ONE stacked :class:`Graph` whose array leaves carry a leading
    shard dim ``[P, ...]``; feed it through ``shard_map`` with
    ``in_specs=P(axis)`` and strip the leading unit dim inside
    (``jax.tree.map(lambda a: a[0], g)``). The per-shard local graph has
      * ``n_pad = Nl + 8`` rows (8 sink rows absorb pad edges),
      * ``col`` in EXTENDED local indexing: ``< n_local`` → shard-local
        row; ``n_local + Hoff[k] + j`` → the j-th halo row received at ring
        offset ``k`` (from owner ``(me - k) mod P``).
        ``ops.spmm.source_table`` materialises the table with ``P-1``
        ``ppermute`` steps, each padded only to its own worst shard pair,
      * ``extras["halo_send_ring"]`` = packed per-ring-offset local rows
        THIS shard sends (segment k, width ``meta halo_hk[k]``, goes to
        peer ``(me + k) mod P``),
      * ``extras["halo_count"]`` = true (unpadded) halo sizes, for comm
        accounting.
    """
    N = graph.num_nodes
    E = graph.num_edges
    row = np.asarray(graph.row)[:E]
    col = np.asarray(graph.col)[:E]
    w = np.asarray(graph.edge_weight)[:E]
    part, local_id, Nl = shard_assignment(graph, n_shards, method, seed)
    n_local = Nl + 8                        # + sink rows for pad edges
    shard_of_dst = part[row]
    shard_of_src = part[col]

    counts = np.bincount(shard_of_dst, minlength=n_shards)
    El = _round_up(int(counts.max()) if E else 1, 8)

    # halo sets: for each (p consumer, q owner) the unique sources p needs
    halo = [[np.zeros(0, np.int64)] * n_shards for _ in range(n_shards)]
    hcount = np.zeros((n_shards, n_shards), np.int64)
    for p in range(n_shards):
        sel = shard_of_dst == p
        for q in range(n_shards):
            if q == p:
                continue
            s = np.unique(col[sel & (shard_of_src == q)])
            halo[p][q] = s
            hcount[p, q] = len(s)

    # Ring-exchange widths: the exchange runs P-1 ppermute steps; at step k
    # shard q sends to peer (q+k)%P, so each step pads only to ITS OWN
    # worst pair — not the global max over all pairs (the r4 all_to_all
    # design padded P*P*Hp rows incl. the self diagonal, which made halo
    # exchange move MORE bytes than all-gather at P=2/4,
    # COMM_VOLUME_r04.json halo_vs_allgather 1.95/1.20).
    Hk = [0] * n_shards
    for k in range(1, n_shards):
        m = max(int(hcount[(q + k) % n_shards, q]) for q in range(n_shards))
        Hk[k] = _round_up(m, 8) if m else 0
    H_total = sum(Hk)
    # block offset of owner q's halo rows in consumer p's extended table:
    # ring offset k = (p - q) mod P, base = n_local + sum_{j<k} Hk[j]
    Hoff = np.zeros(n_shards, np.int64)
    np.cumsum(Hk[:-1], out=Hoff[1:]) if n_shards > 1 else None

    # packed send table on owner q: segment k holds the rows q sends to
    # (q+k)%P, padded to Hk[k]
    send = np.zeros((n_shards, max(H_total, 1)), np.int32)
    for q in range(n_shards):
        for k in range(1, n_shards):
            p = (q + k) % n_shards
            s = halo[p][q]
            send[q, Hoff[k]: Hoff[k] + len(s)] = local_id[s]

    # extended-local column remap + per-shard CSR
    row_l = np.full((n_shards, El), n_local - 1, np.int32)
    col_x = np.zeros((n_shards, El), np.int32)
    w_s = np.zeros((n_shards, El), np.float32)
    ptrs = np.zeros((n_shards, n_local + 1), np.int32)
    for p in range(n_shards):
        sel = shard_of_dst == p
        k = int(sel.sum())
        rl = local_id[row[sel]]
        cg = col[sel]
        cq = shard_of_src[sel]
        cl = np.where(cq == p, local_id[cg], 0).astype(np.int64)
        rem = cq != p
        for q in range(n_shards):
            m = rem & (cq == q)
            if not m.any():
                continue
            pos = np.searchsorted(halo[p][q], cg[m])
            rk = (p - q) % n_shards
            cl[m] = n_local + Hoff[rk] + pos
        order = np.argsort(rl, kind="stable")
        row_l[p, :k] = rl[order]
        col_x[p, :k] = cl[order]
        w_s[p, :k] = w[sel][order]
        ptrs[p] = np.searchsorted(row_l[p], np.arange(n_local + 1))

    node_list = np.full((n_shards, Nl), -1, np.int64)
    node_list[part, local_id] = np.arange(N)

    def shard_nodes(a, fill=0):
        if a is None:
            return None
        a = np.asarray(a)
        out = np.full((n_shards, n_local) + a.shape[1:], fill, a.dtype)
        out[:, :Nl] = _gather_shard_nodes(a, node_list, fill)
        return jnp.asarray(out)

    meta = dict(graph.meta)
    meta.update(halo_axis=axis, halo_hk=tuple(Hk), halo_nl=Nl,
                halo_partition=method)
    nmask_np = np.zeros(graph.n_pad, bool)
    nmask_np[:N] = True
    nm = shard_nodes(nmask_np, False)
    return Graph(
        row_ptr=jnp.asarray(ptrs), row=jnp.asarray(row_l),
        col=jnp.asarray(col_x), edge_weight=jnp.asarray(w_s),
        num_nodes=Nl, num_edges=El,
        x=shard_nodes(graph.x),
        y=shard_nodes(graph.y),
        train_mask=(None if graph.train_mask is None
                    else shard_nodes(graph.train_mask, False) & nm),
        val_mask=(None if graph.val_mask is None
                  else shard_nodes(graph.val_mask, False) & nm),
        test_mask=(None if graph.test_mask is None
                   else shard_nodes(graph.test_mask, False) & nm),
        extras={"halo_send_ring": jnp.asarray(send),
                "halo_count": jnp.asarray(hcount),
                "halo_nodes": jnp.asarray(node_list.astype(np.int32)),
                "real_node": nm},
        meta=tuple(sorted(meta.items())),
    )


def halo_comm_volume(stacked: "Graph") -> dict:
    """Rows exchanged per step: boundary-only vs full all-gather."""
    hc = np.asarray(stacked.extras["halo_count"])
    P_, Nl = hc.shape[0], stacked.meta_get("halo_nl")
    Hk = stacked.meta_get("halo_hk")
    return {
        "halo_rows_exact": int(hc.sum()),
        "halo_rows_padded": int(P_ * sum(Hk)),
        "allgather_rows": int(P_ * (P_ - 1) * Nl),
    }
