"""SpMM / SDDMM / multi-head aggregation — dispatch layer.

Replaces the reference operator stack (cogdl/operators/spmm.py:43-83 SPMMFunction,
operators/mhspmm.py, utils/spmm_utils.py:85-251 dispatch) with two tiers:

  * fallback tier (always available, CPU/TPU): gather + sorted segment_sum —
    the analog of the reference's ``spmm_scatter`` (utils/spmm_utils.py:43-52).
    JAX autodiff derives the backward (transpose-SpMM for dx, SDDMM for dw)
    automatically from this formulation.
  * performance tier: the Pallas sorted-segment kernel
    (cogdl_tpu.ops.pallas.segment_kernels), selected on TPU when the graph
    carries a prepared tile-chunk layout (prepare_spmm).

Both tiers share the shape contract: features ``[N_pad, F]`` in, ``[N_pad, F]``
out, pad rows produce zeros (pad edges carry zero weight).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..data.graph import Graph
from . import segment as seg

__all__ = [
    "spmm",
    "spmm_coo",
    "sddmm",
    "mh_spmm",
    "mh_sddmm",
    "edge_softmax",
    "s_add_e_sum",
    "s_mul_e_sum",
    "s_sub_e_sum",
    "s_add_e_mean",
    "s_mul_e_mean",
    "s_dot_t",
    "aggregate",
]


def spmm_coo(
    x: jnp.ndarray,
    row: jnp.ndarray,
    col: jnp.ndarray,
    weight: Optional[jnp.ndarray],
    num_segments: int,
    sorted: bool = True,
) -> jnp.ndarray:
    """out[r] = sum over edges e with row[e]==r of weight[e] * x[col[e]]."""
    msg = seg.gather(x, col)
    if weight is not None:
        w = weight.reshape((-1,) + (1,) * (msg.ndim - 1))
        msg = msg * w
    return seg.segment_sum(msg, row, num_segments, sorted)


def source_table(graph: Graph, x: jnp.ndarray) -> jnp.ndarray:
    """The table source-side gathers (``x[graph.col]``) read from.

    Single device: ``x`` itself. Under graph-partition parallelism
    (parallel/halo.py ``partition_graph_halo``), ``graph.col`` holds
    EXTENDED local indices — rows ``< n_pad`` are shard-local, rows beyond
    address the boundary/halo rows received from peer shards. Here the
    boundary rows are exchanged (one ``all_to_all`` over the mesh axis,
    only the halo sets — NOT the full feature matrix) and concatenated:
    the TPU-native equivalent of the reference's partitioned DGL/sampling
    fallbacks, and the thing that makes partitioning a parallelism
    strategy (comm volume O(boundary), not O(N))."""
    extras = graph.extras
    if not extras or "halo_send_ring" not in extras:
        return x
    axis = graph.meta_get("halo_axis")
    Hk = graph.meta_get("halo_hk")              # static per-offset widths
    send_idx = extras["halo_send_ring"]         # packed [sum(Hk)] local rows
    P_ = len(Hk)
    # P-1 ppermute steps: at step k this shard's segment k goes to peer
    # (me + k) mod P, so the k-th received block comes from owner
    # (me - k) mod P — exactly the layout the host-side col remap assumed.
    # Each step is padded only to ITS OWN worst shard pair (width Hk[k]),
    # unlike a single all_to_all, which pads every pair to the global max.
    blocks = []
    off = 0
    for k in range(1, P_):
        wk = int(Hk[k])
        if wk == 0:
            continue
        idx = jax.lax.slice_in_dim(send_idx, off, off + wk)
        buf = jnp.take(x, idx, axis=0, mode="clip")
        try:
            buf = jax.lax.ppermute(
                buf, axis, [(i, (i + k) % P_) for i in range(P_)])
        except (NameError, NotImplementedError):
            # traced OUTSIDE the mesh axis (flax init / shape probing —
            # NameError under jit, NotImplementedError in eager eval):
            # halo rows are zeros — shapes and params are identical, values
            # are only meaningful inside shard_map
            buf = jnp.zeros_like(buf)
        blocks.append(buf)
        off += wk
    if not blocks:
        return x
    return jnp.concatenate([x] + blocks, axis=0)


def gather_src(graph: Graph, x: jnp.ndarray) -> jnp.ndarray:
    """Per-edge source features ``x[col[e]]`` — halo-aware."""
    return seg.gather(source_table(graph, x), graph.col)


def spmm(graph: Graph, x: jnp.ndarray, actnn: bool = False, fast_spmm=None) -> jnp.ndarray:
    """``Y = A @ X`` over the graph's (weighted) adjacency.

    API mirror of reference ``spmm(graph, x)`` (utils/spmm_utils.py:85) —
    aggregates source features into destination nodes.
    """
    from . import pallas as _pl  # local import: keeps CPU-only paths light

    kern = _pl.maybe_pallas_spmm(graph, x)
    if kern is not None:
        return kern
    return spmm_coo(source_table(graph, x), graph.row, graph.col,
                    graph.edge_weight, graph.n_pad)


def cache_propagation(graph: Graph, adj_norm: str = "sym") -> Graph:
    """Precompute the first-layer propagation ``P = Â X`` (and the row-sum
    column ``s = Â 1`` that carries the bias through the aggregation).

    A GCN's first layer is linear in the *static* input features, so
    ``Â (X W + 1 bᵀ) = (Â X) W + (Â 1) bᵀ`` — with ``Â`` and ``X`` constant
    across training steps, caching ``P`` and ``s`` removes the first layer's
    SpMM (and its gather sweep) from every forward AND backward pass.
    This is the same algebra SGC/SIGN exploit (reference
    cogdl/models/nn/sgc.py precomputes ``A^k X`` once); here it is applied as
    an exact, opt-out optimisation of GCN itself — valid whenever the layer-1
    input is ``graph.x`` untouched by dropout (the model checks both).

    Call AFTER any normalisation / ``prepare_spmm`` so the cached product
    matches what the model's own ``spmm`` would compute. Stores
    ``extras["prop_x"]`` ([N_pad, F]) and ``extras["prop_s"]`` ([N_pad, 1]);
    both ride the pytree as jit arguments.
    """
    from ..data.graph import col_norm as _cn, row_norm as _rn, sym_norm as _sn

    g = {"sym": _sn, "row": _rn, "col": _cn, "none": lambda a: a}[adj_norm](graph)
    if g.x is None:
        raise ValueError("cache_propagation needs node features on the graph")
    p = spmm(g, g.x)
    s = spmm(g, jnp.ones((g.n_pad, 1), g.x.dtype))
    extras = dict(graph.extras or {})
    extras.update(prop_x=p, prop_s=s)
    return graph.replace(extras=extras)


def sddmm(graph: Graph, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Sampled dense-dense matmul: per-edge ``a[row[e]] · b[col[e]]``.

    Reference: cogdl/operators/spmm/sddmm_kernel.cu (used for SpMM backward
    wrt edge weights); here exposed as a first-class op for attention scores.
    Returns ``[E]`` for 2-D inputs, ``[E, H]`` for 3-D ``[N, H, D]`` inputs.
    """
    ar = seg.gather(a, graph.row)
    br = gather_src(graph, b)
    return jnp.sum(ar * br, axis=-1)


def edge_softmax(
    graph: Graph, scores: jnp.ndarray, mask_pad: bool = True
) -> jnp.ndarray:
    """Per-destination softmax of edge scores ``[E]`` or ``[E, H]``.

    Reference: cogdl/operators/edge_softmax/edge_softmax.cu.
    Pad edges are masked out so they contribute zero attention.
    """
    mask = graph.edge_mask() if mask_pad else None
    return seg.segment_softmax(scores, graph.row, graph.n_pad, mask=mask)


def mh_spmm(graph: Graph, attention: jnp.ndarray, h: jnp.ndarray) -> jnp.ndarray:
    """Multi-head SpMM: ``out[v,h,:] = Σ_e att[e,h] · feat[col[e],h,:]``.

    Reference: cogdl/operators/spmm/multiheadSpmm.cu via MHSPMMFunction
    (operators/mhspmm.py:45). ``attention: [E, H]``, ``h: [N, H, D]``.
    """
    from . import pallas as _pl

    out = _pl.maybe_pallas_mh_spmm(graph, attention, h)
    if out is not None:
        return out
    # gather the FLAT [N, H·D] rows: a 3-D [N, H, D] gather tiles as
    # D-lane rows on TPU (8x lane waste at D=16 — CLAUDE.md)
    H, D = h.shape[1], h.shape[2]
    msg = gather_src(graph, h.reshape(-1, H * D)).reshape(-1, H, D)
    msg = msg * attention[:, :, None]
    return seg.segment_sum(msg, graph.row, graph.n_pad)


def mh_sddmm(graph: Graph, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Per-edge per-head dots for ``[N, H, D]`` inputs → ``[E, H]``.
    Reference: multiheadSddmm.cu. Gathers ride in flat 128-lane form."""
    H, D = a.shape[1], a.shape[2]
    ae = seg.gather(a.reshape(-1, H * D), graph.row).reshape(-1, H, D)
    be = gather_src(graph, b.reshape(-1, H * D)).reshape(-1, H, D)
    return jnp.sum(ae * be, axis=-1)


# ---------------------------------------------------------------------------
# Generic message ops (reference cogdl/operators/ops.py:1-171)
# ---------------------------------------------------------------------------

def _combine(op: str, src: jnp.ndarray, edge: jnp.ndarray) -> jnp.ndarray:
    if edge.ndim < src.ndim:
        edge = edge.reshape(edge.shape + (1,) * (src.ndim - edge.ndim))
    if op == "add":
        return src + edge
    if op == "mul":
        return src * edge
    if op == "sub":
        return src - edge
    raise ValueError(op)


def _s_op_e_agg(op: str, agg: str, graph: Graph, src_feat, edge_feat):
    msg = _combine(op, gather_src(graph, src_feat), edge_feat)
    # pad edges must not contribute: zero them (gathered sink features are 0,
    # but edge_feat on pads may not be)
    m = graph.edge_mask().reshape((-1,) + (1,) * (msg.ndim - 1))
    msg = jnp.where(m, msg, 0.0)
    if agg == "sum":
        return seg.segment_sum(msg, graph.row, graph.n_pad)
    if agg == "mean":
        s = seg.segment_sum(msg, graph.row, graph.n_pad)
        deg = graph.in_degrees().reshape((-1,) + (1,) * (msg.ndim - 1))
        return s / jnp.maximum(deg, 1.0)
    if agg == "max":
        return seg.segment_max(msg, graph.row, graph.n_pad)
    raise ValueError(agg)


def s_add_e_sum(graph, src, edge):
    return _s_op_e_agg("add", "sum", graph, src, edge)


def s_mul_e_sum(graph, src, edge):
    return _s_op_e_agg("mul", "sum", graph, src, edge)


def s_sub_e_sum(graph, src, edge):
    return _s_op_e_agg("sub", "sum", graph, src, edge)


def s_add_e_mean(graph, src, edge):
    return _s_op_e_agg("add", "mean", graph, src, edge)


def s_mul_e_mean(graph, src, edge):
    return _s_op_e_agg("mul", "mean", graph, src, edge)


def s_dot_t(graph, src, dst):
    """Per-edge dot of source and destination features → ``[E, 1]``
    (reference ops.py ``s_dot_t``)."""
    return sddmm(graph, dst, src)[:, None]


def aggregate(graph: Graph, x: jnp.ndarray, how: str = "sum") -> jnp.ndarray:
    """Neighborhood aggregation of source features into destinations."""
    f = graph.meta_get("fanout")
    if f and how in ("sum", "mean"):
        # regular-fanout block (device sampler): every real dst owns EXACTLY
        # f dst-major slots, so the "scatter" is a [n, f, F] reshape-reduce —
        # no segment op at all (dead slots carry zero features/weights)
        n = graph.meta_get("frontier")
        msg = seg.gather(x, graph.col[: n * f]).reshape(n, f, -1)
        ew = graph.edge_weight[: n * f].reshape(n, f, 1)
        if how == "sum":
            red = jnp.sum(msg * ew, axis=1)
        else:
            # weighted mean over LIVE slots (dead slots carry weight 0);
            # under the device sampler's unit weights this equals sum/f
            red = (jnp.sum(msg * ew, axis=1)
                   / jnp.maximum(jnp.sum(ew, axis=1), 1.0))
        out = jnp.zeros((graph.n_pad, red.shape[-1]), red.dtype)
        return jax.lax.dynamic_update_slice(out, red, (0, 0))
    if how == "sum":
        return spmm(graph, x)
    msg = seg.gather(x, graph.col)
    if how == "mean":
        return seg.segment_mean(msg, graph.row, graph.n_pad)
    if how == "max":
        m = graph.edge_mask().reshape((-1,) + (1,) * (msg.ndim - 1))
        msg = jnp.where(m, msg, seg._NEG_INF)
        return seg.segment_max(msg, graph.row, graph.n_pad)
    raise ValueError(how)
