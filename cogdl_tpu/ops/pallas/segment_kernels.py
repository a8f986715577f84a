"""Pallas TPU kernel: sorted-segment-sum SpMM — the performance tier replacing
the reference's GE-SpMM CUDA kernels (cogdl/operators/spmm/spmm_kernel.cu).

TPU-first formulation (not a CUDA translation): the scatter direction of SpMM
is reformulated as a stream of dense MXU matmuls.

  Host prep (once per graph): CSR edges are grouped by destination-row tile
  (R rows per tile), each tile's edge list is padded to a multiple of the
  chunk size T, and — crucially for gather locality — edges *within a tile
  are sorted by source column*, so the XLA gather that materialises messages
  sweeps the feature matrix near-sequentially instead of randomly.
  Layout arrays:
      col_k[E_k]            source index per slot (gather indices)
      w_k[n_chunks, T]      edge weight per slot (0 on pads)
      row_k[n_chunks, T]    absolute destination row per slot
      chunk_tile[n_chunks]  output tile per chunk (monotonic)

  Device: msg = take(x, col_k) (pure gather, no elementwise epilogue), then
  the kernel streams msg in (T, Fblk) chunks (auto double-buffered by
  BlockSpec pipelining), builds the weighted one-hot matrix
      P[r, t] = w[t] * (row[t] == tile_base + r)
  in registers and accumulates out_tile += P @ msg_chunk on the MXU. The
  weight multiply rides inside P, so no [E, F] intermediate is ever written.
  Because chunk→tile mapping is monotonic, Pallas keeps each output tile
  resident in VMEM across its chunks and flushes once.

This turns an unvectorisable scatter-add (XLA: ~57 GB/s on TPU) into
sequential streaming + systolic matmuls (~10 ms for 6.5M×128 edges ≈
340 GB/s effective).
"""

from __future__ import annotations

import functools
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

R_TILE = 128     # destination rows per output tile
T_CHUNK = 1024   # edges per streamed chunk (1-D arrays tile as T(1024))
F_BLK = 128      # feature lanes per grid step


def build_spmm_layout(
    row: np.ndarray,
    col: np.ndarray,
    weight: np.ndarray,
    n_pad: int,
    rows_per_tile: int = R_TILE,
    chunk: int = T_CHUNK,
) -> Dict[str, np.ndarray]:
    """Host-side: build the tile-chunk-padded edge layout for one direction.

    ``row`` must be sorted ascending (CSR order). Within each row tile the
    edges are re-sorted by ``col`` for gather locality (aggregation is
    order-agnostic inside a tile — the one-hot matrix routes rows).
    """
    assert n_pad % rows_per_tile == 0, (n_pad, rows_per_tile)
    n_tiles = n_pad // rows_per_tile
    row = np.asarray(row, np.int64)
    col = np.asarray(col, np.int64)
    weight = np.asarray(weight, np.float32)
    E = row.shape[0]

    tile_of_edge = row // rows_per_tile
    # within-tile sort by column (stable on tile): single lexsort
    order = np.lexsort((col, tile_of_edge))
    row, col, weight, tile_of_edge = (
        row[order], col[order], weight[order], tile_of_edge[order])

    counts = np.bincount(tile_of_edge, minlength=n_tiles)
    padded = np.maximum(np.ceil(counts / chunk).astype(np.int64), 1) * chunk
    starts_padded = np.zeros(n_tiles + 1, np.int64)
    np.cumsum(padded, out=starts_padded[1:])
    starts_real = np.zeros(n_tiles + 1, np.int64)
    np.cumsum(counts, out=starts_real[1:])
    E_k = int(starts_padded[-1])

    row_k = np.repeat(np.arange(n_tiles) * rows_per_tile, padded)  # tile base
    col_k = np.zeros(E_k, np.int64)
    w_k = np.zeros(E_k, np.float32)
    orig_k = np.full(E_k, -1, np.int64)
    pos = (starts_padded[tile_of_edge]
           + (np.arange(E) - starts_real[tile_of_edge]))
    row_k[pos] = row
    col_k[pos] = col
    w_k[pos] = weight
    orig_k[pos] = order  # position in the ORIGINAL (pre-layout) edge order

    n_chunks = E_k // chunk
    chunk_tile = np.repeat(np.arange(n_tiles), padded // chunk).astype(np.int32)
    assert chunk_tile.shape[0] == n_chunks

    return {
        "col_k": col_k.astype(np.int32),
        "w_k": w_k,
        "row_k": row_k.astype(np.int32),
        "orig_k": orig_k.astype(np.int32),
        "chunk_tile": chunk_tile,
    }


def _seg_mm_kernel(chunk_tile_ref, msg_ref, row_ref, w_ref, out_ref):
    from jax.experimental import pallas as pl

    c = pl.program_id(1)
    tile = chunk_tile_ref[c]
    is_first = jnp.logical_or(c == 0, chunk_tile_ref[jnp.maximum(c - 1, 0)] != tile)

    @pl.when(is_first)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    rows = row_ref[:][None, :]                          # [1, T] int32 (abs row)
    base = tile * R_TILE
    r_ids = jax.lax.broadcasted_iota(jnp.int32, (R_TILE, T_CHUNK), 0) + base
    p = jnp.where(rows == r_ids, w_ref[:][None, :], 0.0).astype(msg_ref.dtype)  # [R, T]
    out_ref[:] += jax.lax.dot_general(
        p, msg_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(out_ref.dtype)


def sorted_segment_matmul(
    msg: jnp.ndarray,         # [E_k, F] messages in padded layout (unweighted)
    row_k: jnp.ndarray,       # [E_k] absolute destination rows
    w_k: jnp.ndarray,         # [E_k] per-slot weights (0 on pads)
    chunk_tile: jnp.ndarray,  # [n_chunks] int32, monotonic
    n_pad: int,
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    """out[r] = Σ_e w_k[e] · msg[e] over slots with row_k[e]==r.
    F must be a multiple of F_BLK (pad features before the gather)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if interpret is None:
        interpret = jax.devices()[0].platform == "cpu"
    E_k, F = msg.shape
    assert F % F_BLK == 0, f"pad features to {F_BLK} before gather (got {F})"
    n_chunks = E_k // T_CHUNK
    nf = F // F_BLK

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nf, n_chunks),
        in_specs=[
            pl.BlockSpec((T_CHUNK, F_BLK), lambda f, c, ct: (c, f)),
            pl.BlockSpec((T_CHUNK,), lambda f, c, ct: (c,)),
            pl.BlockSpec((T_CHUNK,), lambda f, c, ct: (c,)),
        ],
        out_specs=pl.BlockSpec((R_TILE, F_BLK), lambda f, c, ct: (ct[c], f)),
    )
    return pl.pallas_call(
        _seg_mm_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_pad, F), msg.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * E_k * R_TILE * F,
            bytes_accessed=E_k * F * 4 + n_pad * F * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(chunk_tile, msg, row_k, w_k)


# ---------------------------------------------------------------------------
# SpMM with custom VJP on top of the kernel
# ---------------------------------------------------------------------------
# The transposed layout drives the backward pass — the reference pairs
# csr-SpMM with csc-SpMM (+ SDDMM for edge-weight grads) the same way in
# SPMMFunction.backward (cogdl/operators/spmm.py:57-83). Layout arrays pass
# as explicit args (not closures) so they stay jit parameters, and their
# zero cotangents are DCE'd.


def _one_direction(x, col_k, w_k, row_k, ct):
    n_pad, F = x.shape
    dtype_in = x.dtype
    if F % F_BLK != 0:
        x = jnp.pad(x, ((0, 0), (0, F_BLK - F % F_BLK)))
    msg = jnp.take(x, col_k, axis=0)
    # the Mosaic kernel runs in f32 (bf16 operands crash this backend);
    # bf16 inputs still save gather bandwidth, the cast rides the stream
    if msg.dtype != jnp.float32:
        msg = msg.astype(jnp.float32)
    out = sorted_segment_matmul(msg, row_k, w_k, ct, n_pad)
    out = out.astype(dtype_in)
    return out[:, :F] if out.shape[1] != F else out


@jax.custom_vjp
def spmm_pallas(x, fw_col, fw_w, fw_row, fw_ct, bw_col, bw_w, bw_row, bw_ct):
    """Y = A @ X (square A, n_pad == x.shape[0]) via the segment kernel."""
    return _one_direction(x, fw_col, fw_w, fw_row, fw_ct)


def _spmm_fwd(x, fw_col, fw_w, fw_row, fw_ct, bw_col, bw_w, bw_row, bw_ct):
    out = _one_direction(x, fw_col, fw_w, fw_row, fw_ct)
    return out, (fw_col, fw_w, fw_row, fw_ct, bw_col, bw_w, bw_row, bw_ct)


def _spmm_bwd(res, g):
    fw_col, fw_w, fw_row, fw_ct, bw_col, bw_w, bw_row, bw_ct = res
    dx = _one_direction(g, bw_col, bw_w, bw_row, bw_ct)
    z = jnp.zeros_like
    return (dx, z(fw_col), z(fw_w), z(fw_row), z(fw_ct),
            z(bw_col), z(bw_w), z(bw_row), z(bw_ct))


spmm_pallas.defvjp(_spmm_fwd, _spmm_bwd)


# ---------------------------------------------------------------------------
# Generic weighted segment-sum over a prepared layout (multi-head SpMM route)
# ---------------------------------------------------------------------------
# out[r] = Σ_slots w[e]·msg[e] with msg ALREADY in layout order — used by
# mh_spmm (GAT aggregation, reference multiheadSpmm.cu): attention is folded
# into the message, w carries the pad-validity mask. Backward: dmsg is a
# row-gather of the cotangent (the transpose of a segment-sum).


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def segment_sum_pallas(msg, row_k, w_k, ct, n_pad):
    return sorted_segment_matmul(msg, row_k, w_k, ct, n_pad)


def _ss_fwd(msg, row_k, w_k, ct, n_pad):
    return sorted_segment_matmul(msg, row_k, w_k, ct, n_pad), (row_k, w_k, ct)


def _ss_bwd(n_pad, res, g):
    row_k, w_k, ct = res
    dmsg = jnp.take(g, row_k, axis=0) * w_k[:, None]
    return dmsg, jnp.zeros_like(row_k), jnp.zeros_like(w_k), jnp.zeros_like(ct)


segment_sum_pallas.defvjp(_ss_fwd, _ss_bwd)


def mh_spmm_pallas(attention, h, fw_col, fw_orig, fw_ones, fw_row, fw_ct,
                   n_pad):
    """out[v,h,:] = Σ_e att[e,h]·feat[col[e],h,:] through the segment kernel.

    ``attention`` arrives in ORIGINAL edge order (as produced by
    edge_softmax); ``fw_orig`` maps layout slots back to original edges
    (clipped gather; pad slots are zeroed by ``fw_ones``).
    """
    E_k = fw_col.shape[0]
    H, D = attention.shape[1], h.shape[2]
    att_k = jnp.take(attention, jnp.maximum(fw_orig, 0), axis=0)
    att_k = att_k * fw_ones[:, None]                     # [E_k, H]
    msg = jnp.take(h.reshape(n_pad, H * D), fw_col, axis=0)
    msg = msg.reshape(E_k, H, D) * att_k[:, :, None]
    msg = msg.reshape(E_k, H * D)
    if msg.dtype != jnp.float32:
        msg = msg.astype(jnp.float32)
    Fp = H * D
    if Fp % F_BLK != 0:
        msg = jnp.pad(msg, ((0, 0), (0, F_BLK - Fp % F_BLK)))
    out = segment_sum_pallas(msg, fw_row, fw_ones, fw_ct, n_pad)
    return out[:, :Fp].reshape(n_pad, H, D).astype(h.dtype)


def gat_attention_aggregate(score_dst, score_src, h, fw_col, fw_row, fw_ones,
                            fw_ct, n_pad, alpha: float = 0.2,
                            attn_drop: float = 0.0, dropout_rng=None):
    """Fused GAT attention + aggregation in layout order.

    Why: [E, H] tensors with H≈8 get column-major layouts on TPU, making
    per-edge gathers/scatters on them ~50× slower than row-major ones
    (profiled: a single [3.1M, 8] attention gather cost 273 ms/step). This
    path never materialises an [E, H] tensor: per-(edge, head) scores live in
    flat 1-D [E_k·H] arrays (T(1024) layout), softmax stats use scalar
    segment ops over (dst, head) ids, and the weighted aggregation reuses the
    sorted-segment MXU kernel on the [E_k, H·D] message stream.

    score_dst/score_src: [N, H] per-node attention halves (a_dstᵀ·h_i etc.)
    h: [N, H, D] transformed features. Returns [n_pad, H, D].
    """
    H, D = h.shape[1], h.shape[2]
    E_k = fw_col.shape[0]
    # flat (edge, head) indexing: id = node*H + head
    heads = jnp.arange(H, dtype=fw_col.dtype)
    row_flat = (fw_row[:, None] * H + heads[None, :]).reshape(-1)   # [E_k*H]
    col_flat = (fw_col[:, None] * H + heads[None, :]).reshape(-1)
    s = (jnp.take(score_dst.reshape(-1), row_flat)
         + jnp.take(score_src.reshape(-1), col_flat))
    s = jax.nn.leaky_relu(s, alpha)
    valid = jnp.repeat(fw_ones, H)
    s = jnp.where(valid > 0, s, -1e30)
    n_seg = n_pad * H
    smax = jax.ops.segment_max(s, row_flat, num_segments=n_seg)
    smax = jnp.where(smax <= -1e29, 0.0, smax)
    ex = jnp.exp(s - jnp.take(smax, row_flat)) * valid
    denom = jax.ops.segment_sum(ex, row_flat, num_segments=n_seg)
    att = ex / jnp.maximum(jnp.take(denom, row_flat), 1e-16)        # [E_k*H]
    if attn_drop > 0.0 and dropout_rng is not None:
        keep = jax.random.bernoulli(dropout_rng, 1.0 - attn_drop, att.shape)
        att = att * keep / (1.0 - attn_drop)

    msg = jnp.take(h.reshape(n_pad, H * D), fw_col, axis=0)          # [E_k,H*D]
    att2 = att.reshape(E_k, H)
    msg = (msg.reshape(E_k, H, D) * att2[:, :, None]).reshape(E_k, H * D)
    if msg.dtype != jnp.float32:
        msg = msg.astype(jnp.float32)
    Fp = H * D
    if Fp % F_BLK != 0:
        msg = jnp.pad(msg, ((0, 0), (0, F_BLK - Fp % F_BLK)))
    out = segment_sum_pallas(msg, fw_row, fw_ones, fw_ct, n_pad)
    return out[:, :Fp].reshape(n_pad, H, D).astype(h.dtype)
