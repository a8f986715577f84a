"""Device-side (jittable) construction of the Pallas SpMM layouts.

The host builder (``segment_kernels.build_spmm_layout``) is fine for graphs
that already live on the host, but at ogbn-products scale the layout arrays
are gigabytes — building them on the host and shipping them over a slow
host→device link dominates end-to-end time. This module builds the identical
layout *on device* with XLA sorts/scans: the only host→device traffic is the
edge list already resident on device (e.g. from a device-side synthetic
generator or a sharded loader).

Key difference from the host builder: the padded slot count ``E_k`` must be
static under jit, so we allocate the worst case ``E + n_tiles·T_CHUNK``
(every tile wastes < one chunk) rounded up to the mega-block size. The extra
tail chunks carry ``w = 0`` and point at the last tile — the kernel streams
through them at ~2% cost at products scale.

Replaces the CUDA-side CSR preprocessing of the reference's GE-SpMM
(cogdl/operators/spmm/spmm_kernel.cu) with a formulation XLA can run on the
accelerator itself.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp

from .segment_kernels import BLOCK_CHUNKS, R_TILE, T_CHUNK


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def build_spmm_layout_jax(
    row: jnp.ndarray,
    col: jnp.ndarray,
    weight: jnp.ndarray,
    n_pad: int,
    with_orig: bool = False,
) -> Dict[str, jnp.ndarray]:
    """Jittable equivalent of ``build_spmm_layout``: group edges by
    destination-row tile, sort within tile by source column (gather
    locality), pad each tile's edge list to whole chunks.

    ``row`` need NOT be pre-sorted (the lexicographic sort handles it).
    Returns the same keys as the host builder; slot arrays have the static
    worst-case length ``round_up(E + n_tiles·T_CHUNK, block)``.
    """
    assert n_pad % R_TILE == 0, n_pad
    n_tiles = n_pad // R_TILE
    E = row.shape[0]
    row = row.astype(jnp.int32)
    col = col.astype(jnp.int32)
    weight = weight.astype(jnp.float32)

    tile = row // R_TILE
    orig = jnp.arange(E, dtype=jnp.int32)
    tile_s, col_s, row_s, w_s, orig_s = jax.lax.sort(
        (tile, col, row, weight, orig), num_keys=2, is_stable=True)

    ones = jnp.ones(E, jnp.int32)
    counts = jax.ops.segment_sum(ones, tile_s, num_segments=n_tiles,
                                 indices_are_sorted=True)
    chunks_per_tile = jnp.maximum((counts + T_CHUNK - 1) // T_CHUNK, 1)
    padded = chunks_per_tile * T_CHUNK
    zero = jnp.zeros(1, padded.dtype)
    starts_padded = jnp.concatenate([zero, jnp.cumsum(padded)])  # [n_tiles+1]
    starts_real = jnp.concatenate([zero, jnp.cumsum(counts)])

    E_k = _round_up(E + n_tiles * T_CHUNK, BLOCK_CHUNKS * T_CHUNK) \
        if E + n_tiles * T_CHUNK > BLOCK_CHUNKS * T_CHUNK \
        else _round_up(E + n_tiles * T_CHUNK, T_CHUNK)
    n_chunks = E_k // T_CHUNK

    pos = (jnp.take(starts_padded, tile_s)
           + (jnp.arange(E, dtype=starts_padded.dtype)
              - jnp.take(starts_real, tile_s)))
    col_k = jnp.zeros(E_k, jnp.int32).at[pos].set(col_s, unique_indices=True)
    w_k = jnp.zeros(E_k, jnp.float32).at[pos].set(w_s, unique_indices=True)
    row_k = jnp.zeros(E_k, jnp.int32).at[pos].set(row_s, unique_indices=True)

    # chunk_tile[c] = owning tile of chunk c; tail chunks → last tile
    chunk_starts = starts_padded // T_CHUNK                      # [n_tiles+1]
    ct = jnp.searchsorted(chunk_starts,
                          jnp.arange(n_chunks, dtype=chunk_starts.dtype),
                          side="right").astype(jnp.int32) - 1
    ct = jnp.clip(ct, 0, n_tiles - 1)

    out = {"col_k": col_k, "w_k": w_k, "row_k": row_k, "chunk_tile": ct}
    if with_orig:
        out["orig_k"] = jnp.full(E_k, -1, jnp.int32).at[pos].set(
            orig_s, unique_indices=True)
    return out


def prepare_spmm_device(graph, symmetric: bool = False,
                        with_orig: bool = False):
    """Device-side ``prepare_spmm``: attach kernel layouts built on the
    accelerator. ``symmetric=True`` (undirected graph with symmetric
    normalisation, i.e. Aᵀ = A) shares the forward layout with the backward
    pass — half the build time and half the HBM.

    ``with_orig=True`` additionally stores the slot→original-edge map the
    fused GAT path needs (costs one more E_k-sized array)."""
    n_pad = graph.n_pad
    assert n_pad % R_TILE == 0, (
        f"pad the graph to a multiple of {R_TILE} rows first "
        f"(data.graph.pad_to); got n_pad={n_pad}")
    E = graph.num_edges
    row, col, w = graph.row[:E], graph.col[:E], graph.edge_weight[:E]

    build = jax.jit(build_spmm_layout_jax,
                    static_argnames=("n_pad", "with_orig"))
    fwd = build(row, col, w, n_pad=n_pad, with_orig=with_orig)
    # symmetric layout sharing is valid for plain SpMM, but the fused-GAT
    # path (with_orig) keys dropout masks on original edge ids, and slot s
    # read transposed is a *different* original edge — build bw properly then
    bwd = fwd if (symmetric and not with_orig) else build(
        col, row, w, n_pad=n_pad, with_orig=with_orig)

    extras = dict(graph.extras or {})
    extras.update({
        "spmm_fw_col": fwd["col_k"], "spmm_fw_w": fwd["w_k"],
        "spmm_fw_row": fwd["row_k"], "spmm_fw_ct": fwd["chunk_tile"],
        "spmm_bw_col": bwd["col_k"], "spmm_bw_w": bwd["w_k"],
        "spmm_bw_row": bwd["row_k"], "spmm_bw_ct": bwd["chunk_tile"],
    })
    if with_orig:
        # the device builder consumes edges in original order for BOTH
        # directions, so each orig_k already indexes the original edge list
        for pre, lay in (("fw", fwd), ("bw", bwd)):
            extras[f"spmm_{pre}_orig"] = lay["orig_k"]
            extras[f"spmm_{pre}_ones"] = (
                lay["orig_k"] >= 0).astype(jnp.float32)
    return graph.replace(extras=extras)
