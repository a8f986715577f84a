"""Pallas TPU kernel: sorted-segment-sum SpMM — the performance tier replacing
the reference's GE-SpMM CUDA kernels (cogdl/operators/spmm/spmm_kernel.cu).

TPU-first formulation (not a CUDA translation): the scatter direction of SpMM
is reformulated as a stream of dense MXU matmuls.

  Host prep (once per graph): CSR edges are grouped by destination-row tile
  (R rows per tile) and each tile's edge list is padded to a multiple of the
  chunk size T, yielding a *tile-chunk-padded* edge layout:
      col_k[E_k], w_k[E_k], row_k[E_k,1], chunk_tile[n_chunks]
  Pad edges carry weight 0, so they vanish in the weighted message.

  Device: msg = take(x, col_k) * w_k (XLA gather — bandwidth-bound), then the
  kernel streams msg in (T, Fblk) chunks (auto double-buffered by BlockSpec
  pipelining), builds the chunk's one-hot row matrix
      P[t, r] = (row_k[e0+t] == tile_base + r)
  entirely in registers, and accumulates out_tile += Pᵀ @ msg_chunk on the
  MXU. Because chunk→tile mapping is monotonic, Pallas keeps each output tile
  resident in VMEM across its chunks and flushes once.

This turns an unvectorisable scatter-add (XLA: ~57 GB/s on TPU) into
sequential streaming + systolic matmuls.
"""

from __future__ import annotations

import functools
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

R_TILE = 128     # destination rows per output tile
T_CHUNK = 512    # edges per streamed chunk
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

    ``row`` must be sorted ascending (CSR order). Returns int32/float32 numpy
    arrays; pad entries have weight 0 and point at their tile's base row with
    col 0.
    """
    assert n_pad % rows_per_tile == 0, (n_pad, rows_per_tile)
    n_tiles = n_pad // rows_per_tile
    row = np.asarray(row, np.int64)
    col = np.asarray(col, np.int64)
    weight = np.asarray(weight, np.float32)
    E = row.shape[0]

    tile_of_edge = row // rows_per_tile
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
    # positions of real edges inside the padded layout
    pos = (starts_padded[tile_of_edge]
           + (np.arange(E) - starts_real[tile_of_edge]))
    row_k[pos] = row
    col_k[pos] = col
    w_k[pos] = weight
    orig_k[pos] = np.arange(E)

    n_chunks = E_k // chunk
    chunk_tile = np.repeat(np.arange(n_tiles), padded // chunk).astype(np.int32)
    assert chunk_tile.shape[0] == n_chunks

    return {
        "row_k": row_k.astype(np.int32).reshape(E_k, 1),
        "col_k": col_k.astype(np.int32),
        "w_k": w_k,
        "orig_k": orig_k.astype(np.int32),
        "chunk_tile": chunk_tile,
    }


def _seg_mm_kernel(chunk_tile_ref, msg_ref, row_ref, out_ref):
    from jax.experimental import pallas as pl

    f = pl.program_id(0)
    c = pl.program_id(1)

    tile = chunk_tile_ref[c]
    is_first = jnp.logical_or(c == 0, chunk_tile_ref[jnp.maximum(c - 1, 0)] != tile)

    @pl.when(is_first)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    rows = row_ref[:]                                   # [T, 1] int32 (abs row)
    base = tile * R_TILE
    r_ids = jax.lax.broadcasted_iota(jnp.int32, (T_CHUNK, R_TILE), 1) + base
    p = (rows == r_ids).astype(msg_ref.dtype)           # [T, R]
    out_ref[:] += jax.lax.dot_general(
        p, msg_ref[:],
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(out_ref.dtype)


def sorted_segment_matmul(
    msg: jnp.ndarray,         # [E_k, F] weighted messages in padded layout
    row_k: jnp.ndarray,       # [E_k, 1] absolute destination rows
    chunk_tile: jnp.ndarray,  # [n_chunks] int32
    n_pad: int,
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    """out[r] = Σ_{e: row_k[e]==r} msg[e] — rows grouped by tile as built by
    :func:`build_spmm_layout`. Returns [n_pad, F]."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if interpret is None:
        interpret = jax.devices()[0].platform == "cpu"
    E_k, F = msg.shape
    n_chunks = E_k // T_CHUNK
    n_tiles = n_pad // R_TILE
    if F % F_BLK != 0:
        msg = jnp.pad(msg, ((0, 0), (0, F_BLK - F % F_BLK)))
    Fp = msg.shape[1]
    nf = Fp // F_BLK

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nf, n_chunks),
        in_specs=[
            pl.BlockSpec((T_CHUNK, F_BLK), lambda f, c, ct: (c, f)),
            pl.BlockSpec((T_CHUNK, 1), lambda f, c, ct: (c, 0)),
        ],
        out_specs=pl.BlockSpec((R_TILE, F_BLK), lambda f, c, ct: (ct[c], f)),
    )
    out = pl.pallas_call(
        _seg_mm_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_pad, Fp), msg.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * E_k * R_TILE * Fp,
            bytes_accessed=E_k * Fp * 4 + n_pad * Fp * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(chunk_tile, msg, row_k)
    return out[:, :F] if Fp != F else out


# ---------------------------------------------------------------------------
# SpMM with custom VJP on top of the kernel
# ---------------------------------------------------------------------------
# The transposed layout drives the backward pass — the reference pairs
# csr-SpMM with csc-SpMM (+ SDDMM for edge-weight grads) the same way in
# SPMMFunction.backward (cogdl/operators/spmm.py:57-83). Layout arrays pass
# as explicit args (not closures) so they stay jit parameters, and their
# zero cotangents are DCE'd.


@jax.custom_vjp
def spmm_pallas(x, fw_col, fw_w, fw_row, fw_ct, bw_col, bw_w, bw_row, bw_ct):
    """Y = A @ X (square A, n_pad == x.shape[0]) via the segment kernel."""
    msg = jnp.take(x, fw_col, axis=0) * fw_w[:, None]
    return sorted_segment_matmul(msg, fw_row, fw_ct, x.shape[0])


def _spmm_fwd(x, fw_col, fw_w, fw_row, fw_ct, bw_col, bw_w, bw_row, bw_ct):
    out = spmm_pallas(x, fw_col, fw_w, fw_row, fw_ct, bw_col, bw_w, bw_row, bw_ct)
    return out, (x.shape[0], bw_col, bw_w, bw_row, bw_ct,
                 fw_col, fw_w, fw_row, fw_ct)


def _spmm_bwd(res, g):
    n_pad, bw_col, bw_w, bw_row, bw_ct, fw_col, fw_w, fw_row, fw_ct = res
    msg = jnp.take(g, bw_col, axis=0) * bw_w[:, None]
    dx = sorted_segment_matmul(msg, bw_row, bw_ct, n_pad)
    z = jnp.zeros_like
    return (dx, z(fw_col), z(fw_w), z(fw_row), z(fw_ct),
            z(bw_col), z(bw_w), z(bw_row), z(bw_ct))


spmm_pallas.defvjp(_spmm_fwd, _spmm_bwd)
