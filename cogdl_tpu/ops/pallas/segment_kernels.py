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

Scaling tiers on top of the kernel (all exercised by bench.py --products at
2.45M nodes / 125M edges on ONE v5e chip):
  * mega-block streaming (``_blocked_gather_spmm``): gather+aggregate in
    ~1 GB message blocks when the full [E_k, F] stream would blow HBM;
  * source panels (``device_layout.build_spmm_layout_jax(panel_rows=...)``):
    blocks gather from a ≤VMEM dynamic slice of the feature table — ~4×
    faster than whole-table row DMA (see CLAUDE.md memory-system notes);
  * configurable dst-tile height (``r_tile``): coarser tiles trade MXU work
    per slot for less chunk-quantisation padding on huge graphs;
  * ``gat_fused``: fully fused GAT attention with a hand-derived VJP —
    softmax denominators and every segment reduction ride this kernel in
    both edge orders, no [E, H] scatters anywhere.
"""

from __future__ import annotations

import functools
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

R_TILE = 128     # destination rows per output tile
T_CHUNK = 1024   # edges per streamed chunk (1-D arrays tile as T(1024))
F_BLK = 128      # feature lanes per grid step
# Mega-block size for the streamed driver: graphs whose gathered message
# stream would not fit in HBM (ogbn-products: 124M edges × 128 f32 ≈ 64 GB)
# are processed in blocks of this many chunks (2048 chunks × 1024 slots ×
# 128 lanes × 4 B = 1 GB per message block).
BLOCK_CHUNKS = 2048

# blocked streaming accumulates in-kernel via input_output_aliases instead
# of the local-slab + dynamic_update_slice route (r4; bench --no-block-accum
# re-tests the old path)
SPMM_BLOCK_ACCUM = True
# Single-shot fused GAT can keep the forward's gathered [h2|ss] stream as a
# VJP residual (PHYSICAL size — lanes round up to 128 — must fit this
# budget); the backward dsd pass then reuses it instead of re-gathering.
# MEASURED A/B on TPU v5e (2026-08-20, 100k×30): 87.26 ms cached vs
# 87.15 ms re-gathered — the dsd re-gather is NOT on the critical path, so
# the default is OFF (holding two ~3.3 GB streams across the backward buys
# nothing). bench.py --stream-cache re-tests it; interpret-mode tests
# exercise the cached path by raising the budget.
GAT_STREAM_CACHE_BYTES = 0
# Blocked fused-GAT forward node-table design:
#   False (default) — node table IS h2; the dst score half is computed
#   in-kernel from ``al`` (no [n_pad, H] sd array, ~2.5 GB saved at
#   products scale).
#   True — node table is the precomputed 128-lane-padded sd table (the
#   round-1 design); costs the sd materialisation but decouples the node
#   operand from the panel-gather table. bench.py --blocked-node-sd A/Bs it.
GAT_BLOCKED_NODE_SD = False
# Single-shot gather-table layout (A/B'd on chip 2026-08-20, 100k×30;
# bench.py --gat-layout):
#   "wide"  — v1: src [h2|ss] (136 lanes) and dst T2 [dagg|dden|sd]
#             (144 lanes) concat tables; 2 unique row sweeps (fwd+dsd CSE),
#             but both tables pad to 256 physical lanes (~117 MB at 100k)
#             and run at the ~13 ns/row HBM gather rate. 87.2 ms.
#   "split" — every table ≤128 lanes (src h2; dst dagg + narrow [dden|sd]):
#             3 unique sweeps. 91.3 ms — the extra sweep beats the
#             per-row saving.
#   "h2"    — src h2 alone (≤128 lanes, ss via ``ar``), dst T2 concat:
#             still 2 sweeps with the fwd table half the bytes.
GAT_SINGLE_LAYOUT = "h2"
# Pin the single-shot h2 gather table with an optimization_barrier. The
# barrier was load-bearing for the v1 wide concat tables (serialized their
# liveness for staging); whether it helps or hinders the plain h2 table is
# measured via bench.py --gat-h2-nobarrier.
GAT_H2_BARRIER = True
# Serialize the two backward passes with a phase barrier (round-1 measured
# a win when every pass gathered a wide table; with the h2 layout the dsd
# pass's ~8 ms of MXU could instead hide under the t2 gather DMA) —
# bench.py --gat-nophase A/Bs it. "single" (default) applies it on the
# single-shot path only: at products the barrier measured a ~1% LOSS on
# the blocked per-direction-panel layout (r5: 6023 ms with vs 5959
# without, same session).
GAT_PHASE_BARRIER = "single"
# Perf-attribution ablations for scripts/microbench_gat_pass.py ONLY — each
# string removes one piece of the fused passes' work to expose its cost on
# the real chip (results are WRONG with any ablation active):
#   "noexp"   — replace the softmax exp with a multiply
#   "noscore" — skip the score chain entirely (ex := validity)
#   "nosd"    — skip the per-slot dst-score broadcast matmul (sd_e := 0)
#   "noar"    — skip the in-register src-score matmul (ss_e := 0)
GAT_ABLATE: frozenset = frozenset()


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


def _make_seg_mm_kernel(r_tile: int):
    from jax.experimental import pallas as pl

    def _seg_mm_kernel(chunk_tile_ref, msg_ref, row_ref, w_ref, out_ref):
        c = pl.program_id(1)
        tile = chunk_tile_ref[c]
        is_first = jnp.logical_or(
            c == 0, chunk_tile_ref[jnp.maximum(c - 1, 0)] != tile)

        @pl.when(is_first)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

        rows = row_ref[:][None, :]                      # [1, T] int32 (abs row)
        base = tile * r_tile
        r_ids = jax.lax.broadcasted_iota(
            jnp.int32, (r_tile, T_CHUNK), 0) + base
        p = jnp.where(rows == r_ids, w_ref[:][None, :],
                      0.0).astype(msg_ref.dtype)        # [R, T]
        out_ref[:] += jax.lax.dot_general(
            p, msg_ref[:],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(out_ref.dtype)

    return _seg_mm_kernel


def _make_seg_mm_accum_kernel(r_tile: int):
    """Accumulating variant: out is ALIASED to the acc input, so the kernel
    read-modify-writes the global output in place — the blocked streaming
    driver then needs no local slab / visited-mask / dynamic_update_slice
    (measured ~27% of the products GCN step in the r4 profile)."""
    from jax.experimental import pallas as pl

    def _kernel(chunk_tile_ref, acc_ref, msg_ref, row_ref, w_ref, out_ref):
        c = pl.program_id(1)
        tile = chunk_tile_ref[c]
        is_first = jnp.logical_or(
            c == 0, chunk_tile_ref[jnp.maximum(c - 1, 0)] != tile)

        rows = row_ref[:][None, :]
        base = tile * r_tile
        r_ids = jax.lax.broadcasted_iota(
            jnp.int32, (r_tile, T_CHUNK), 0) + base
        p = jnp.where(rows == r_ids, w_ref[:][None, :],
                      0.0).astype(msg_ref.dtype)
        contrib = jax.lax.dot_general(
            p, msg_ref[:],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(out_ref.dtype)

        @pl.when(is_first)
        def _():
            # first chunk of this tile IN THIS CALL: seed from the running
            # accumulator (prior panels' partial sums live there)
            out_ref[:] = acc_ref[:] + contrib

        @pl.when(jnp.logical_not(is_first))
        def _():
            out_ref[:] += contrib

    return _kernel


def sorted_segment_matmul_accum(
    acc: jnp.ndarray,         # [n_pad, F] running output (updated in place)
    msg: jnp.ndarray,         # [E_k, F] messages in padded layout
    row_k: jnp.ndarray,       # [E_k] absolute destination rows
    w_k: jnp.ndarray,         # [E_k] per-slot weights (0 on pads)
    chunk_tile: jnp.ndarray,  # [n_chunks] int32, monotonic (ABSOLUTE tiles)
    interpret: Optional[bool] = None,
    r_tile: int = R_TILE,
) -> jnp.ndarray:
    """acc[r] += Σ_e w_k[e]·msg[e] over slots with row_k[e]==r. The result
    aliases ``acc`` (donated); tiles no chunk touches keep their prior
    values — callers stream mega-blocks and pass the SAME buffer through."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if interpret is None:
        interpret = jax.devices()[0].platform == "cpu"
    E_k, F = msg.shape
    n_pad = acc.shape[0]
    assert F % F_BLK == 0 and acc.shape[1] == F, (acc.shape, F)
    assert n_pad % r_tile == 0, (n_pad, r_tile)
    n_chunks = E_k // T_CHUNK
    nf = F // F_BLK

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nf, n_chunks),
        in_specs=[
            pl.BlockSpec((r_tile, F_BLK), lambda f, c, ct: (ct[c], f)),
            pl.BlockSpec((T_CHUNK, F_BLK), lambda f, c, ct: (c, f)),
            pl.BlockSpec((T_CHUNK,), lambda f, c, ct: (c,)),
            pl.BlockSpec((T_CHUNK,), lambda f, c, ct: (c,)),
        ],
        out_specs=pl.BlockSpec((r_tile, F_BLK), lambda f, c, ct: (ct[c], f)),
    )
    return pl.pallas_call(
        _make_seg_mm_accum_kernel(r_tile),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_pad, F), acc.dtype),
        # operand indices INCLUDE the scalar-prefetch arg: acc is operand 1
        input_output_aliases={1: 0},
        cost_estimate=pl.CostEstimate(
            flops=2 * E_k * r_tile * F,
            bytes_accessed=E_k * F * 4 + 2 * n_chunks * r_tile * F * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(chunk_tile, acc, msg, row_k, w_k)


def sorted_segment_matmul(
    msg: jnp.ndarray,         # [E_k, F] messages in padded layout (unweighted)
    row_k: jnp.ndarray,       # [E_k] absolute destination rows
    w_k: jnp.ndarray,         # [E_k] per-slot weights (0 on pads)
    chunk_tile: jnp.ndarray,  # [n_chunks] int32, monotonic
    n_pad: int,
    interpret: Optional[bool] = None,
    r_tile: int = R_TILE,
) -> jnp.ndarray:
    """out[r] = Σ_e w_k[e] · msg[e] over slots with row_k[e]==r.
    F must be a multiple of F_BLK (pad features before the gather)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if interpret is None:
        interpret = jax.devices()[0].platform == "cpu"
    E_k, F = msg.shape
    assert F % F_BLK == 0, f"pad features to {F_BLK} before gather (got {F})"
    assert n_pad % r_tile == 0, (n_pad, r_tile)
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
        out_specs=pl.BlockSpec((r_tile, F_BLK), lambda f, c, ct: (ct[c], f)),
    )
    return pl.pallas_call(
        _make_seg_mm_kernel(r_tile),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_pad, F), msg.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * E_k * r_tile * F,
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


def _blocked_gather_spmm(x, col_k, w_k, row_k, ct, n_pad,
                         block_panel=None, panel_rows: int = 0,
                         block_chunks: int = BLOCK_CHUNKS,
                         r_tile: int = R_TILE):
    """Streamed gather+aggregate over mega-blocks of the layout — for graphs
    whose full message stream would blow HBM. Each block gathers its own
    message slice, runs the segment kernel on a REBASED local tile range
    (chunk_tile is monotonic within a block), and adds its partial slab into
    the global output at a dynamic offset. Tiles split across a block
    boundary receive partial sums from both blocks; local tiles a block never
    visits (possible with panel layouts) are masked before accumulating.

    ``panel_rows > 0`` activates source-panel gathering: ``col_k`` holds
    PANEL-LOCAL indices and ``block_panel[b]`` names each block's source
    panel. The gather then reads a ≤VMEM-sized dynamic slice of ``x``, which
    runs ~4× faster than row-DMA from a multi-GB table (measured on v5e:
    2.9 vs 10.9 ns/row).

    Pass the slot arrays PRE-RESHAPED to [n_blocks, S] (the device builder
    emits this shape): a call-time reshape from 1-D T(1024) tiling to 2-D
    T(8,128) is a physical relayout copy that XLA hoists out of the loop —
    measured as multi-GB resident temps at products scale."""
    F = x.shape[1]
    if col_k.ndim == 1:
        E_k = col_k.shape[0]
        n_chunks = E_k // T_CHUNK
        assert n_chunks % block_chunks == 0, (n_chunks, block_chunks)
        n_blocks = n_chunks // block_chunks
        S = block_chunks * T_CHUNK
        col_k = col_k.reshape(n_blocks, S)
        w_k = w_k.reshape(n_blocks, S)
        row_k = row_k.reshape(n_blocks, S)
        ct = ct.reshape(n_blocks, block_chunks)
    else:
        n_blocks, S = col_k.shape
        block_chunks = S // T_CHUNK
    n_local = block_chunks * r_tile  # a block spans ≤ block_chunks tiles

    if block_panel is None or panel_rows <= 0:
        block_panel = jnp.zeros(n_blocks, jnp.int32)

    blk = (col_k, w_k, row_k, ct, block_panel)

    if SPMM_BLOCK_ACCUM:
        # in-place accumulation: the Pallas kernel read-modify-writes the
        # global output at ABSOLUTE tile offsets (input_output_aliases), so
        # the per-block local slab, visited-mask select and
        # dynamic_update_slice disappear (~27% of the products GCN step in
        # the r4 on-chip profile)
        def body_accum(out, b):
            col_b, w_b, row_b, ct_b, pid = b
            if panel_rows > 0:
                start = jnp.minimum(pid * panel_rows,
                                    x.shape[0] - panel_rows)
                src = jax.lax.dynamic_slice(x, (start, 0), (panel_rows, F))
                col_b = col_b + (pid * panel_rows - start)
            else:
                src = x
            msg = jnp.take(src, col_b, axis=0, mode="clip")
            if msg.dtype != jnp.float32:
                msg = msg.astype(jnp.float32)
            out = sorted_segment_matmul_accum(out, msg, row_b, w_b, ct_b,
                                              r_tile=r_tile)
            return out, None

        out = jnp.zeros((n_pad, F), jnp.float32)
        out, _ = jax.lax.scan(body_accum, out, blk)
        return out

    def body(out, b):
        col_b, w_b, row_b, ct_b, pid = b
        first = ct_b[0]
        if panel_rows > 0:
            # clamp the last panel's window instead of padding x (a pad
            # would copy the whole multi-GB table); shift indices to match
            start = jnp.minimum(pid * panel_rows, x.shape[0] - panel_rows)
            src = jax.lax.dynamic_slice(x, (start, 0), (panel_rows, F))
            col_b = col_b + (pid * panel_rows - start)
        else:
            src = x
        msg = jnp.take(src, col_b, axis=0, mode="clip")
        if msg.dtype != jnp.float32:
            msg = msg.astype(jnp.float32)
        ct_local = ct_b - first
        local = sorted_segment_matmul(
            msg, row_b - first * r_tile, w_b, ct_local, n_local,
            r_tile=r_tile)
        # local tiles this block's chunks never visited hold undefined
        # kernel memory — zero them before accumulating
        visited = jnp.zeros(block_chunks, jnp.bool_).at[ct_local].set(
            True, mode="drop")
        local = jnp.where(jnp.repeat(visited, r_tile)[:, None], local, 0.0)
        start = first * r_tile
        slab = jax.lax.dynamic_slice(out, (start, 0), (n_local, local.shape[1]))
        out = jax.lax.dynamic_update_slice(out, slab + local, (start, 0))
        return out, None

    out = jnp.zeros((n_pad + n_local, F), jnp.float32)
    out, _ = jax.lax.scan(body, out, blk)
    return out[:n_pad]


def _one_direction(x, col_k, w_k, row_k, ct, bp=None, panel_rows: int = 0,
                   gather_bf16: bool = False, r_tile: int = R_TILE):
    n_pad, F = x.shape
    dtype_in = x.dtype
    if F % F_BLK != 0:
        x = jnp.pad(x, ((0, 0), (0, F_BLK - F % F_BLK)))
        # XLA rewrites pad-then-gather into gather-then-pad (fewer gathered
        # bytes in its cost model), but gathers here are ROW-count-bound
        # (CLAUDE.md memory economics) and the hoisted pad then streams over
        # E_k edge rows instead of n_pad table rows — measured ~11 ms/step
        # of pure pad at 100k nodes with F=47 outputs. The barrier pins the
        # pad to the table side.
        x = jax.lax.optimization_barrier(x)
    if gather_bf16 and x.dtype == jnp.float32:
        # bf16 gather tables: rows cost the same DMA time regardless of
        # width, but halving bytes doubles how many rows fit a VMEM-staged
        # panel → half the panels → far less chunk-quantisation padding.
        # The kernel still computes in f32 (messages cast after the gather).
        x = x.astype(jnp.bfloat16)
    n_chunks = ct.shape[0] * (ct.shape[1] if ct.ndim == 2 else 1)
    if panel_rows > 0:
        # panel layouts carry PANEL-LOCAL column indices — falling back to
        # the whole-table gather would silently read wrong rows
        assert ct.ndim == 2 or n_chunks % BLOCK_CHUNKS == 0, (
            "panel layouts must be mega-block aligned (use the device "
            "builder's per-panel padding)")
    if (ct.ndim == 2
            or ((panel_rows > 0 or n_chunks > BLOCK_CHUNKS)
                and n_chunks % BLOCK_CHUNKS == 0)):
        out = _blocked_gather_spmm(x, col_k, w_k, row_k, ct, n_pad,
                                   block_panel=bp, panel_rows=panel_rows,
                                   r_tile=r_tile)
        out = out.astype(dtype_in)
        return out[:, :F] if out.shape[1] != F else out
    msg = jnp.take(x, col_k, axis=0, mode="clip")
    # the Mosaic kernel runs in f32 (bf16 operands crash this backend);
    # bf16 inputs still save gather bandwidth, the cast rides the stream
    if msg.dtype != jnp.float32:
        msg = msg.astype(jnp.float32)
    out = sorted_segment_matmul(msg, row_k, w_k, ct, n_pad, r_tile=r_tile)
    out = out.astype(dtype_in)
    return out[:, :F] if out.shape[1] != F else out


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2))
def spmm_pallas_p(panel_rows, gather_bf16, r_tile,
                  x, fw_col, fw_w, fw_row, fw_ct, fw_bp,
                  bw_col, bw_w, bw_row, bw_ct, bw_bp):
    """Y = A @ X via the segment kernel, with optional source-panel layouts
    (panel_rows > 0 ⇒ col arrays are panel-local, ``*_bp`` maps mega-blocks
    to panels), optional bf16 gather tables, and a configurable dst-tile
    height (bigger tiles trade MXU work for less chunk-quantisation padding
    on huge graphs)."""
    return _one_direction(x, fw_col, fw_w, fw_row, fw_ct, fw_bp, panel_rows,
                          gather_bf16, r_tile)


def _spmm_p_fwd(panel_rows, gather_bf16, r_tile,
                x, fw_col, fw_w, fw_row, fw_ct, fw_bp,
                bw_col, bw_w, bw_row, bw_ct, bw_bp):
    out = _one_direction(x, fw_col, fw_w, fw_row, fw_ct, fw_bp, panel_rows,
                         gather_bf16, r_tile)
    return out, (fw_col, fw_w, fw_row, fw_ct, fw_bp,
                 bw_col, bw_w, bw_row, bw_ct, bw_bp)


def _spmm_p_bwd(panel_rows, gather_bf16, r_tile, res, g):
    (fw_col, fw_w, fw_row, fw_ct, fw_bp,
     bw_col, bw_w, bw_row, bw_ct, bw_bp) = res
    dx = _one_direction(g, bw_col, bw_w, bw_row, bw_ct, bw_bp, panel_rows,
                        gather_bf16, r_tile)
    z = jnp.zeros_like
    return (dx, z(fw_col), z(fw_w), z(fw_row), z(fw_ct), z(fw_bp),
            z(bw_col), z(bw_w), z(bw_row), z(bw_ct), z(bw_bp))


spmm_pallas_p.defvjp(_spmm_p_fwd, _spmm_p_bwd)


def spmm_pallas(x, fw_col, fw_w, fw_row, fw_ct, bw_col, bw_w, bw_row, bw_ct):
    """Y = A @ X (square A, n_pad == x.shape[0]) via the segment kernel —
    single-panel convenience wrapper around :func:`spmm_pallas_p`."""
    zb = jnp.zeros(0, jnp.int32)
    return spmm_pallas_p(0, False, R_TILE, x, fw_col, fw_w, fw_row, fw_ct,
                         zb, bw_col, bw_w, bw_row, bw_ct, zb)


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
    dmsg = jnp.take(g, row_k, axis=0, mode="clip") * w_k[:, None]
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
    att_k = jnp.take(attention, jnp.maximum(fw_orig, 0), axis=0, mode="clip")
    att_k = att_k * fw_ones[:, None]                     # [E_k, H]
    msg = jnp.take(h.reshape(n_pad, H * D), fw_col, axis=0, mode="clip")
    msg = msg.reshape(E_k, H, D) * att_k[:, :, None]
    msg = msg.reshape(E_k, H * D)
    if msg.dtype != jnp.float32:
        msg = msg.astype(jnp.float32)
    Fp = H * D
    if Fp % F_BLK != 0:
        msg = jnp.pad(msg, ((0, 0), (0, F_BLK - Fp % F_BLK)))
    out = segment_sum_pallas(msg, fw_row, fw_ones, fw_ct, n_pad)
    return out[:, :Fp].reshape(n_pad, H, D).astype(h.dtype)


# ---------------------------------------------------------------------------
# Fused GAT: attention scores + softmax + aggregation, fully kernel-tier
# ---------------------------------------------------------------------------
# TPU gather economics (profiled on v5e, scripts/microbench_gather6.py):
# row gathers are ROW-COUNT-bound — a 136/144-lane table costs the same per
# row as a 128-lane one (~5.5 ns/row at 114k-row tables), a second gather
# costs a second full row sweep even on the same table (staging does not
# amortise: 2 gathers ≈ 8 ns/row combined), and per-(edge, head) 4 B flat
# lookups or unsorted segment scatters run at ~0.5 GB/s (~230 ms each — 15
# of them made the first fused attempt slower than the unfused route).
# Design rules baked in:
#   1. exactly ONE per-edge gather per kernel pass: quantities indexed by
#      the layout's GROUPING KEY (dst in the fw layout, src in the bw
#      layout) are never gathered — they arrive as an [r_tile, W] node-table
#      block selected by the chunk→tile map, and per-slot values are
#      extracted on the MXU as Pᵀ·block (P is the one-hot routing matrix the
#      aggregation builds anyway);
#   2. no per-edge intermediate ([E, H] scores, [E, HD] weighted messages)
#      ever touches HBM — scores, softmax numerator/denominator, and grads
#      are computed in VMEM and leave the kernel only as segment sums;
#   3. softmax max-subtraction uses the per-(node,head) upper bound
#      m[r,h] = leakyrelu(sd[r,h] + max_c ss[c,h]) — an exact shift
#      (softmax is invariant to per-segment constants, so stop_gradient(m)
#      has zero true gradient), avoiding a segment-max entirely;
#   4. attention dropout masks are a counter-based hash of the ORIGINAL edge
#      id, computed IN-REGISTER inside each pass (fixed-shift murmur mixer),
#      so fwd and both bwd layouts regenerate the same mask and no [E, H]
#      keep stream ever touches HBM;
#   5. head-broadcasts ([T,H] → [T,H·D]) and narrow-lane extraction ride
#      small constant 0/1 matmuls (iota-built in registers) instead of
#      in-kernel reshapes.
# The hand-derived VJP mirrors the reference's fused dgNN GAT backward
# (third_party dgNN, cogdl/operators/fused_gat.py) but with layout-order
# kernel passes in both edge orders instead of CUDA atomics: three passes
# total (fwd: num+den; bwd fw-layout: dsd; bwd bw-layout: dh2+dss), one
# gather each.


def _pad_lanes(a: jnp.ndarray, mult: int = F_BLK) -> jnp.ndarray:
    f = a.shape[-1]
    if f % mult == 0:
        return a
    return jnp.pad(a, ((0, 0), (0, mult - f % mult)))


def _seg_pass(vals: jnp.ndarray, row_k, ones, ct, n_pad: int,
              width: int) -> jnp.ndarray:
    """Segment-sum [E_k, width] values by destination through the MXU
    kernel; returns [n_pad, width]."""
    return sorted_segment_matmul(_pad_lanes(vals), row_k, ones, ct,
                                 n_pad)[:, :width]


def _edge_scores(sd_e, ss_e, ssmax, ones, alpha, abl: frozenset = frozenset()):
    """Per-edge pre-activation, leaky-relu slope, and bounded exp score."""
    if "noscore" in abl:
        one = jnp.ones_like(sd_e)
        return one, one * ones[:, None]
    pre = sd_e + ss_e
    slope = jnp.where(pre > 0, 1.0, alpha)
    s = pre * slope
    m = sd_e + ssmax[None, :]
    m = jnp.where(m > 0, m, alpha * m)          # lrelu(sd + max ss) ≥ s
    if "noexp" in abl:
        ex = (s - m) * 0.125 * ones[:, None]    # same shape, no transcendental
    else:
        ex = jnp.exp(s - m) * ones[:, None]
    return slope, ex


def _pad_to(a: jnp.ndarray, w: int) -> jnp.ndarray:
    return a if a.shape[1] == w else jnp.pad(a, ((0, 0), (0, w - a.shape[1])))


def _make_gat_pass_kernel(mode: str, H: int, D: int, HDp: int, r_tile: int,
                          alpha: float, attn_drop: float,
                          packed: bool = False, stream_has_ss: bool = False,
                          exact_scores: bool = False,
                          node_is_h2: bool = False,
                          split_t2: bool = False,
                          accum: bool = False):
    """One fused GAT pass over a prepared edge layout.

    mode 'fwd' : stream=[h2|ss] by src, node=sd (dst key)
                 → out [r, HDp+128] = [Σ exn·msg | Σ ex]
    mode 'dsd' : stream=[h2|ss] by src, node=[dagg|dden|sd] (dst key)
                 → out [r, 128] = Σ ds  (∂L/∂sd, segmented by dst)
    mode 'dsrc': stream=[dagg|dden|sd] by dst, node=[h2|ss] (src key)
                 → out [r, HDp+128] = [Σ exn·dagg | Σ ds]  (∂h2, ∂ss by src)

    ``node_is_h2`` (blocked 'fwd' only): the node table is h2 itself and the
    dst score half is computed IN-KERNEL per tile as (h2_tile @ al) — no
    [n_pad, H] sd array (16×-lane-padded ≈ 1.25 GB at OGB scale) ever
    materialises; ``al`` is the :func:`build_ar` matrix of a_dst.

    All H-wide quantities live in full 128-lane registers; lanes ≥ H carry
    zeros or benign values that the 0/1 selection matmuls mask out.
    """
    from jax.experimental import pallas as pl

    with_drop = attn_drop > 0.0
    inv_keep = 1.0 / (1.0 - attn_drop) if with_drop else None
    # keep iff hash(edge, head, seed) < keep_prob · 2³²
    thresh = int((1.0 - attn_drop) * float(2 ** 32 - 1))
    HD = H * D
    abl = GAT_ABLATE

    def mm(a, b, ca, cb, exact=exact_scores):
        # TPU f32 dots multiply in bf16 passes by default (f32 accumulate) —
        # the routing/aggregation matmuls keep that (mixed-precision
        # aggregation, same class as the reference's fp16 AMP). Score-
        # forming matmuls optionally run at HIGHEST (6-pass exact f32)
        # because the softmax exp amplifies score rounding.
        prec = jax.lax.Precision.HIGHEST if exact else None
        return jax.lax.dot_general(
            a, b, dimension_numbers=(((ca,), (cb,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec)

    def kernel(*refs):
        ct_ref = refs[0]
        al_ref = cp_ref = sd_ref = None
        if packed:
            nxt = 1
            if with_drop:
                # prefetch scalars: per-chunk global-column offset (panel
                # base) + the step seed — the dropout mask is hashed from
                # the slot's (row, col) COORDINATES in-register, so no
                # per-slot dropout state exists anywhere
                cp_ref, sd_ref = refs[1], refs[2]
                nxt = 3
            stream_ref, pack_ref, node_ref, smax_ref, ar_ref = (
                refs[nxt:nxt + 5])
            nxt += 5
            if node_is_h2:
                al_ref = refs[nxt]
                nxt += 1
            base_ref = None
        elif stream_has_ss:
            # the src table carries ss — no ar operand in this mode
            stream_ref, row_ref, w_ref, node_ref, smax_ref = refs[1:6]
            ar_ref = None
            base_ref = refs[6] if with_drop else None
        else:
            i = 1
            stream_ref = refs[i]
            i += 1
            stream2_ref = None
            if split_t2 and mode == "dsrc":
                stream2_ref = refs[i]      # [T, 2H] gathered [dden|sd]
                i += 1
            row_ref, w_ref, node_ref = refs[i], refs[i + 1], refs[i + 2]
            i += 3
            node2_ref = None
            if split_t2 and mode == "dsd":
                node2_ref = refs[i]        # [r, 2H] node [dden|sd] table
                i += 1
            smax_ref, ar_ref = refs[i], refs[i + 1]
            i += 2
            base_ref = refs[i] if with_drop else None
        out_ref = refs[-1]
        acc_ref = refs[-2] if accum else None

        c = pl.program_id(0)
        tile = ct_ref[c]
        is_first = jnp.logical_or(
            c == 0, ct_ref[jnp.maximum(c - 1, 0)] != tile)

        @pl.when(is_first)
        def _():
            # accum mode: out is ALIASED to the running global accumulator —
            # seed each tile from it instead of zero (prior mega-blocks'
            # partial sums live there); the streamed driver then needs no
            # local slab / visited mask / dynamic_update_slice
            out_ref[:] = acc_ref[:] if accum else jnp.zeros_like(out_ref)

        base = tile * r_tile
        if packed:
            # one int32 per slot: (col | row_off << 18 | valid << 28) —
            # rows (10-bit offset: r_tile ≤ 1024) and validity unpack
            # in-register. Values are < 2^29 so u32 shifts are exact; Mosaic
            # has no u32→i32/f32 casts, so the results come back via free
            # bitcasts (and validity via i32→f32, which it does support).
            pk = jax.lax.bitcast_convert_type(pack_ref[:], jnp.uint32)
            off = jax.lax.bitcast_convert_type(
                (pk >> jnp.uint32(18)) & jnp.uint32(0x3FF), jnp.int32)
            rows = (base + off)[None, :]
            w = jax.lax.bitcast_convert_type(
                (pk >> jnp.uint32(28)) & jnp.uint32(1),
                jnp.int32).astype(jnp.float32)
        else:
            rows = row_ref[:][None, :]                   # [1, T] abs key row
            w = w_ref[:]                                 # [T] slot validity
        r_ids = jax.lax.broadcasted_iota(
            jnp.int32, (r_tile, T_CHUNK), 0) + base
        pv = jnp.where(rows == r_ids, w[None, :], 0.0)   # [r, T] routing

        if not (node_is_h2 and mode == "fwd"):
            nd = mm(pv, node_ref[:], 0, 0)               # [T, Wn] per-slot
        stream = stream_ref[:]                           # [T, Ws]
        smax = smax_ref[0, :]                            # [128]

        keepn = None
        if with_drop:
            # counter-based dropout, fully in-register: murmur-style mixer
            # over a per-edge key · H + head — fixed shifts only, and
            # identical in every layout, so fwd and both bwd passes see the
            # same mask without any [E, H] keep stream touching HBM.
            # Packed (blocked) layouts derive the key from the slot's
            # (dst, src) COORDINATES — dst = unpacked row for the
            # dst-grouped passes, the col bits for the src-grouped pass —
            # so no orig maps (~1.7 GB at products scale) exist at all;
            # single-shot layouts key on (orig edge id ^ seed) as before.
            # LIMITATION (coordinate keying): parallel/duplicate edges
            # between the same (dst, src) pair share one keep/drop decision
            # on blocked layouts — dropout is correlated across multigraph
            # duplicates (the orig-id key gave each its own mask). Simple
            # graphs (every GRB/OGB benchmark here) are unaffected.
            if packed:
                # Mosaic bitcasts need VECTORS: do the offset adds in i32
                # (values < 2^31) and splat scalars before any bitcast
                colg = jax.lax.bitcast_convert_type(
                    pk & jnp.uint32((1 << 18) - 1), jnp.int32) + cp_ref[c]
                cu = jax.lax.bitcast_convert_type(colg, jnp.uint32)
                ru = jax.lax.bitcast_convert_type(base + off, jnp.uint32)
                sv = jax.lax.bitcast_convert_type(
                    jnp.full((T_CHUNK,), sd_ref[0], jnp.int32), jnp.uint32)
                du, su = (ru, cu) if mode in ("fwd", "dsd") else (cu, ru)
                ek = ((du * jnp.uint32(0x9E3779B1))
                      ^ (su * jnp.uint32(0x85EBCA77)) ^ sv)
            else:
                ek = base_ref[:].astype(jnp.uint32)
            hx = (ek[:, None] * jnp.uint32(H)
                  + jax.lax.broadcasted_iota(jnp.uint32, (T_CHUNK, 128), 1))
            hx = hx * jnp.uint32(747796405) + jnp.uint32(2891336453)
            hx = hx ^ (hx >> jnp.uint32(16))
            hx = hx * jnp.uint32(0x85EBCA6B)
            hx = hx ^ (hx >> jnp.uint32(13))
            hx = hx * jnp.uint32(0xC2B2AE35)
            hx = hx ^ (hx >> jnp.uint32(16))
            keepn = jnp.where(hx < jnp.uint32(thresh), inv_keep, 0.0)

        # B[h, l] = 1 iff lane l belongs to head h — head broadcast (dim 0
        # contraction) and per-head reduction (dim 1 contraction)
        hi = jax.lax.broadcasted_iota(jnp.int32, (128, HDp), 0)
        lj = jax.lax.broadcasted_iota(jnp.int32, (128, HDp), 1)
        bmat = jnp.where(
            jnp.logical_and(lj // D == hi, jnp.logical_and(hi < H, lj < HD)),
            1.0, 0.0)

        # tables arrive COMPACT ([h2|ss] = HD+H lanes, [dagg|dden|sd] =
        # HD+2H) — gathers are cheaper below 2 physical lane tiles and pads
        # would burn HBM. Pieces are extracted into full 128-lane registers
        # by iota-built 0/1 matmuls (arbitrary-offset lane slices are
        # relayouts; MXU selections are ~free next to the routing matmuls).
        def ext_wide(x):
            ws = x.shape[1]
            if HD == HDp and ws >= HDp:
                return x[:, :HDp]
            wi = jax.lax.broadcasted_iota(jnp.int32, (ws, HDp), 0)
            lj2 = jax.lax.broadcasted_iota(jnp.int32, (ws, HDp), 1)
            return mm(x, jnp.where(
                jnp.logical_and(wi == lj2, lj2 < HD), 1.0, 0.0), 1, 0)

        def ext_h(x, off):
            ws = x.shape[1]
            wi = jax.lax.broadcasted_iota(jnp.int32, (ws, 128), 0)
            li = jax.lax.broadcasted_iota(jnp.int32, (ws, 128), 1)
            return mm(x, jnp.where(
                jnp.logical_and(wi == li + off, li < H), 1.0, 0.0), 1, 0)

        # src-score half: with stream_has_ss the src table is [h2|ss] and
        # ss rides lanes HD..HD+H (the single-shot path — one wide table per
        # phase keeps the gather staging behaviour this backend rewards);
        # otherwise the stream is h2 alone and ss is RECOMPUTED in-register
        # as msg @ ar (blocked/products path — removes the concat table and
        # its ~4.8 GB of double-layout temps at OGB scale).
        ar = None if ar_ref is None else ar_ref[:]

        def src_score(src_tab, msg):
            if "noar" in abl:
                return jnp.zeros((T_CHUNK, 128), jnp.float32)
            if stream_has_ss:
                return ext_h(src_tab, HD)
            return mm(msg, ar, 1, 0)

        # when the head scalars fit the HDp padding (HD + H <= HDp), the
        # den/ds outputs FOLD into lanes [HD, HD+H) — half the output width
        # and one routing matmul saved (output-layer shapes at OGB scale)
        folded = HD + H <= HDp

        def fold_h(x):
            """[T, 128] head scalars -> lanes [HD, HD+H) of an HDp register."""
            hi2 = jax.lax.broadcasted_iota(jnp.int32, (128, HDp), 0)
            lj3 = jax.lax.broadcasted_iota(jnp.int32, (128, HDp), 1)
            return mm(x, jnp.where(
                jnp.logical_and(lj3 == hi2 + HD, hi2 < H), 1.0, 0.0), 1, 0)

        if mode == "fwd":
            if "nosd" in abl:
                sd_e = jnp.zeros((T_CHUNK, 128), jnp.float32)
            elif node_is_h2:
                # dst score half from the h2 node block itself: one tiny
                # [r, HDp]·[HDp, 128] matmul per tile, then the routing
                # matmul broadcasts it per slot — no sd array in HBM
                sd_tile = mm(ext_wide(node_ref[:]), al_ref[:], 1, 0)
                sd_e = mm(pv, sd_tile, 0, 0)             # [T, 128]
            else:
                sd_e = nd                                # [T, 128]
            msg = ext_wide(stream)
            ss_e = src_score(stream, msg)
            _, ex = _edge_scores(sd_e, ss_e, smax, w, alpha, abl)
            if folded and not with_drop:
                # merged epilogue (r5): one matmul against the combined
                # broadcast+fold matrix B2 (disjoint lane ranges), then a
                # single elementwise select — saves one [T,128]x[128,HDp]
                # matmul per chunk vs exw + fold_h. msg lanes >= HD are
                # zero (ext_wide), so adding 1 on the fold lanes routes the
                # raw ex there while the broadcast lanes pick up msg*exw.
                hi2 = jax.lax.broadcasted_iota(jnp.int32, (128, HDp), 0)
                lj3 = jax.lax.broadcasted_iota(jnp.int32, (128, HDp), 1)
                b2 = jnp.where(
                    jnp.logical_and(lj3 // D == hi2,
                                    jnp.logical_and(hi2 < H, lj3 < HD)),
                    1.0, 0.0) + jnp.where(
                    jnp.logical_and(lj3 == hi2 + HD, hi2 < H), 1.0, 0.0)
                lane = jax.lax.broadcasted_iota(jnp.int32, (1, HDp), 1)
                ones_f = jnp.where(
                    jnp.logical_and(lane >= HD, lane < HD + H), 1.0, 0.0)
                out_ref[:] += mm(pv, mm(ex, b2, 1, 0) * (msg + ones_f), 1, 0)
                return
            exn = ex * keepn if with_drop else ex
            exw = mm(exn, bmat, 1, 0)                    # [T, HDp]
            if folded:
                out_ref[:] += mm(pv, msg * exw + fold_h(ex), 1, 0)
            else:
                out_ref[:, :HDp] += mm(pv, msg * exw, 1, 0)
                out_ref[:, HDp:] += mm(pv, ex, 1, 0)
            return

        # both backward modes: unpack the dst side ([dagg|dden|sd] as one
        # 144-lane table, or split dagg + [dden|sd] pair when split_t2) and
        # h2 (src side)
        if mode == "dsd":
            src = stream
            if split_t2:
                dst, dpair = nd, mm(pv, node2_ref[:], 0, 0)
            else:
                dst, dpair = nd, None
        else:
            src = nd
            if split_t2:
                dst, dpair = stream, stream2_ref[:]
            else:
                dst, dpair = stream, None
        dagg_e = ext_wide(dst)
        if "nosd" in abl:
            dden_e = sd_e = jnp.zeros((T_CHUNK, 128), jnp.float32)
        elif split_t2:
            dden_e = ext_h(dpair, 0)
            sd_e = ext_h(dpair, H)
        else:
            dden_e = ext_h(dst, HD)
            sd_e = ext_h(dst, HD + H)
        msg = ext_wide(src)
        ss_e = src_score(src, msg)
        slope, ex = _edge_scores(sd_e, ss_e, smax, w, alpha, abl)
        dex = mm(dagg_e * msg, bmat, 1, 1)               # [T, 128] per-head Σ
        if with_drop:
            dex = dex * keepn
        ds = (dex + dden_e) * ex * slope
        if mode == "dsd":
            out_ref[:] += mm(pv, ds, 1, 0)
        elif folded:
            exn = ex * keepn if with_drop else ex
            exw = mm(exn, bmat, 1, 0)
            out_ref[:] += mm(pv, dagg_e * exw + fold_h(ds), 1, 0)
            return
        else:
            exn = ex * keepn if with_drop else ex
            exw = mm(exn, bmat, 1, 0)
            out_ref[:, :HDp] += mm(pv, dagg_e * exw, 1, 0)
            out_ref[:, HDp:] += mm(pv, ds, 1, 0)

    return kernel


def _gat_pass(mode, H, D, alpha, attn_drop, stream, row_k, w_k, node_tab,
              smax_tab, ar, base, ct, n_pad, r_tile: int = R_TILE,
              local_out: bool = False, pack: Optional[jnp.ndarray] = None,
              stream_has_ss: bool = False, exact_scores: bool = False,
              al: Optional[jnp.ndarray] = None, node_is_h2: bool = False,
              stream2: Optional[jnp.ndarray] = None,
              node2: Optional[jnp.ndarray] = None,
              split_t2: bool = False,
              cp: Optional[jnp.ndarray] = None,
              seed_arr: Optional[jnp.ndarray] = None,
              acc: Optional[jnp.ndarray] = None,
              interpret: Optional[bool] = None):
    """One fused pass over (a block of) the layout. ``ct`` holds ABSOLUTE
    tile ids — the node table is always indexed globally; with
    ``local_out=True`` the output BlockSpec rebases tiles by ``ct[0]`` so the
    pass writes an ``n_pad``-row *local slab* (the mega-block driver
    accumulates slabs into the global buffer). ``pack`` replaces
    ``row_k``/``w_k`` with one int32 stream (rows/validity unpack
    in-register)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if interpret is None:
        interpret = jax.devices()[0].platform == "cpu"
    E_k, Ws = stream.shape
    Wn = node_tab.shape[1]
    HD = H * D
    HDp = -(-HD // F_BLK) * F_BLK
    n_chunks = E_k // T_CHUNK
    Wout = 128 if mode == "dsd" else (
        HDp if HD + H <= HDp else HDp + 128)
    packed = pack is not None
    # packed dropout passes prefetch (ct, col-offset, seed) scalars; every
    # index_map must then accept the extra prefetch refs
    in_specs = [pl.BlockSpec((T_CHUNK, Ws), lambda c, *pf: (c, 0))]
    args = [stream]
    if packed:
        in_specs.append(pl.BlockSpec((T_CHUNK,), lambda c, *pf: (c,)))
        args.append(pack)
    else:
        if split_t2 and mode == "dsrc":
            W2 = stream2.shape[1]
            in_specs.append(pl.BlockSpec((T_CHUNK, W2),
                                         lambda c, *pf: (c, 0)))
            args.append(stream2)
        in_specs += [
            pl.BlockSpec((T_CHUNK,), lambda c, *pf: (c,)),
            pl.BlockSpec((T_CHUNK,), lambda c, *pf: (c,)),
        ]
        args += [row_k, w_k]
    in_specs.append(pl.BlockSpec((r_tile, Wn), lambda c, *pf: (pf[0][c], 0)))
    args.append(node_tab)
    if not packed and split_t2 and mode == "dsd":
        Wn2 = node2.shape[1]
        in_specs.append(pl.BlockSpec((r_tile, Wn2),
                                     lambda c, *pf: (pf[0][c], 0)))
        args.append(node2)
    in_specs.append(pl.BlockSpec((8, 128), lambda c, *pf: (0, 0)))
    args.append(smax_tab)
    if not (stream_has_ss and not packed):
        in_specs.append(pl.BlockSpec((HDp, 128), lambda c, *pf: (0, 0)))
        args.append(ar)
    if node_is_h2:
        in_specs.append(pl.BlockSpec((HDp, 128), lambda c, *pf: (0, 0)))
        args.append(al)
    if attn_drop > 0.0 and not packed:
        in_specs.append(pl.BlockSpec((T_CHUNK,), lambda c, *pf: (c,)))
        args.append(base)
    accum = acc is not None
    aliases = {}
    if accum:
        # the running global accumulator rides as the LAST input, aliased to
        # the output (operand indices include the scalar-prefetch args)
        assert not local_out and acc.shape == (n_pad, Wout), (acc.shape,
                                                              n_pad, Wout)
        in_specs.append(pl.BlockSpec((r_tile, Wout),
                                     lambda c, *pf: (pf[0][c], 0)))
        args.append(acc)
    if local_out:
        out_spec = pl.BlockSpec((r_tile, Wout),
                                lambda c, *pf: (pf[0][c] - pf[0][0], 0))
    else:
        out_spec = pl.BlockSpec((r_tile, Wout), lambda c, *pf: (pf[0][c], 0))
    if packed and attn_drop > 0.0:
        n_prefetch, pf_args = 3, (ct, cp, seed_arr)
    else:
        n_prefetch, pf_args = 1, (ct,)
    if accum:
        aliases = {n_prefetch + len(args) - 1: 0}
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=n_prefetch, grid=(n_chunks,), in_specs=in_specs,
        out_specs=out_spec)
    return pl.pallas_call(
        _make_gat_pass_kernel(mode, H, D, HDp, r_tile, alpha, attn_drop,
                              packed=packed, stream_has_ss=stream_has_ss,
                              exact_scores=exact_scores,
                              node_is_h2=node_is_h2, split_t2=split_t2,
                              accum=accum),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_pad, Wout), jnp.float32),
        input_output_aliases=aliases,
        cost_estimate=pl.CostEstimate(
            flops=2 * E_k * (r_tile * (Ws + Wn + Wout) + 3 * 128 * 128),
            bytes_accessed=E_k * (Ws + 8) * 4 + n_pad * (Wn + Wout) * 4,
            transcendentals=E_k * 128,
        ),
        interpret=interpret,
    )(*pf_args, *args)


def _gat_apply(mode, H, D, alpha, attn_drop, table, node_tab, smax_tab, ar,
               col, row, ones, ct, orig, bp, seed, n_pad,
               panel_rows: int = 0, r_tile: int = R_TILE,
               src_has_ss: bool = False, exact_scores: bool = False,
               al: Optional[jnp.ndarray] = None, node_is_h2: bool = False):
    """Gather the pass's stream from ``table`` and run the fused pass —
    one-shot for 1-D layouts, mega-block streamed for blocked 2-D layouts
    (huge graphs whose [E_k, W] stream would blow HBM). Blocked layouts may
    carry ``panel_rows > 0`` source panels: ``col`` is PANEL-LOCAL and each
    block gathers from a ≤VMEM ``dynamic_slice`` of ``table`` (the same
    staged-gather fast path the SpMM driver uses — 2.9 vs 10.9 ns/row)."""
    if ct.ndim == 1:
        stream = jnp.take(table, col, axis=0, mode="clip")
        base = _drop_base(orig, seed, attn_drop)
        return _gat_pass(mode, H, D, alpha, attn_drop, stream, row, ones,
                         node_tab, smax_tab, ar, base, ct, n_pad,
                         r_tile=r_tile, stream_has_ss=src_has_ss,
                         exact_scores=exact_scores)

    # blocked layouts are PACKED: ``col`` carries one int32 per slot
    # (panel-local col | dst-tile row offset << 18 | validity << 28) — a
    # third of the col+row+ones footprint at products scale; ``row``/``ones``
    # are unused dummies. Attention dropout needs NO per-slot state: the
    # mask is hashed in-kernel from each slot's (dst, src) coordinates
    # (global col = panel base + packed col bits), so ``orig`` maps are
    # never consulted on this path.
    n_blocks, bc = ct.shape
    n_local = bc * r_tile
    Wt = table.shape[1]
    HD = H * D
    HDp = -(-HD // F_BLK) * F_BLK
    Wout = 128 if mode == "dsd" else (
        HDp if HD + H <= HDp else HDp + 128)
    if bp is None or panel_rows <= 0:
        bp = jnp.zeros(n_blocks, jnp.int32)
    with_drop = attn_drop > 0.0
    seed_arr = (jax.lax.bitcast_convert_type(
        seed.astype(jnp.uint32), jnp.int32).reshape(1)
        if with_drop else None)

    def gather_stream(b):
        pack_b, ct_b, pid = b
        col_b = pack_b & jnp.int32((1 << 18) - 1)
        if panel_rows > 0:
            # clamp the last panel's window instead of padding the table
            start = jnp.minimum(pid * panel_rows, table.shape[0] - panel_rows)
            src = jax.lax.dynamic_slice(table, (start, 0), (panel_rows, Wt))
            col_b = col_b + (pid * panel_rows - start)
        else:
            src = table
        stream = jnp.take(src, col_b, axis=0, mode="clip")
        if stream.dtype != jnp.float32:
            stream = stream.astype(jnp.float32)
        cp_b = (jnp.full((bc,), pid * panel_rows, jnp.int32)
                if with_drop else None)
        return stream, cp_b

    xs = (col, ct, bp)
    if SPMM_BLOCK_ACCUM:
        # in-place accumulation at ABSOLUTE tile offsets (aliased output) —
        # no local slab / visited mask / dynamic_update_slice (same r4
        # optimisation as the plain-SpMM streamed driver)
        def body_accum(out, b):
            pack_b, ct_b, pid = b
            stream, cp_b = gather_stream(b)
            out = _gat_pass(mode, H, D, alpha, attn_drop, stream, None,
                            None, node_tab, smax_tab, ar, None, ct_b, n_pad,
                            r_tile=r_tile, pack=pack_b,
                            exact_scores=exact_scores, al=al,
                            node_is_h2=node_is_h2, cp=cp_b,
                            seed_arr=seed_arr, acc=out)
            return out, None

        out = jnp.zeros((n_pad, Wout), jnp.float32)
        out, _ = jax.lax.scan(body_accum, out, xs)
        return out

    def body(out, b):
        pack_b, ct_b, pid = b
        first = ct_b[0]
        stream, cp_b = gather_stream(b)
        local = _gat_pass(mode, H, D, alpha, attn_drop, stream, None,
                          None, node_tab, smax_tab, ar, None, ct_b, n_local,
                          r_tile=r_tile, local_out=True, pack=pack_b,
                          exact_scores=exact_scores, al=al,
                          node_is_h2=node_is_h2, cp=cp_b,
                          seed_arr=seed_arr)
        # local tiles this block's chunks never visited hold undefined
        # kernel memory — zero them before accumulating
        visited = jnp.zeros(bc, jnp.bool_).at[ct_b - first].set(
            True, mode="drop")
        local = jnp.where(jnp.repeat(visited, r_tile)[:, None], local, 0.0)
        off = first * r_tile
        slab = jax.lax.dynamic_slice(out, (off, 0), (n_local, Wout))
        out = jax.lax.dynamic_update_slice(out, slab + local, (off, 0))
        return out, None

    out = jnp.zeros((n_pad + n_local, Wout), jnp.float32)
    out, _ = jax.lax.scan(body, out, xs)
    return out[:n_pad]


def build_ar(a_src: jnp.ndarray, H: int, D: int) -> jnp.ndarray:
    """Block-diagonal src-attention matrix for the in-kernel score
    recompute: ``ar[h·D+d, h] = a_src[h, d]`` so that
    ``ss_e = msg @ ar`` reproduces ``Σ_d a_src[h,d]·h2[c,h·D+d]``."""
    HD = H * D
    HDp = -(-HD // F_BLK) * F_BLK
    assert H <= 128, H
    rows = jnp.arange(HD)
    cols = rows // D
    return jnp.zeros((HDp, 128), jnp.float32).at[rows, cols].set(
        a_src.reshape(HD).astype(jnp.float32))


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3, 4, 5, 6, 7))
def gat_fused_p(H: int, D: int, alpha: float, attn_drop: float,
                panel_rows: int, panel_rows_bw: int, r_tile: int,
                exact_scores: bool,
                sd, ss, h2, ar, al, seed,
                fw_col, fw_row, fw_ones, fw_ct, fw_orig, fw_bp,
                bw_col, bw_row, bw_ones, bw_ct, bw_orig, bw_bp):
    """out[r,h,:] = Σ_e∈r softmax_e(leakyrelu(sd[r,h]+ss[col_e,h]))·h[col_e,h,:]

    sd/ss: [n_pad, H] score halves (aᵀ_dst·h_r, aᵀ_src·h_c); h2: [n_pad, H·D]
    transformed features; ``ar``/``al``: the :func:`build_ar` matrices of
    a_src/a_dst — the kernels gather h2 alone and recompute the src score
    half in-register (``ss`` itself is consumed only for the softmax bound),
    so ``ss`` MUST equal ``h2 @ ar`` for correct results. On BLOCKED 2-D
    layouts ``sd`` MUST likewise equal ``(h2 @ al)[:, :H]``: the passes
    compute the dst half from h2/``al`` too, and ``sd`` is never read (its
    cotangent is still returned, so layer-level autodiff routes the score
    grads into a_dst/h) — no 16×-lane-padded [n_pad, H] arrays survive at
    OGB scale. seed: uint32 scalar for dropout. Layout arrays from the
    prepared extras (fw = dst-grouped, bw = src-grouped); blocked layouts
    stream in mega-blocks, optionally with ``panel_rows`` source panels
    (``*_bp`` maps blocks to panels). ``panel_rows_bw`` sizes the
    src-grouped (dsrc backward) layout's panels SEPARATELY: that pass
    gathers the [dagg|dden|sd] table, whose rows are one 128-lane tile
    WIDER than h2's — per-direction sizing keeps every pass's panel slice
    inside the VMEM staging budget while the four h2-gathering sweeps use
    ~2x bigger panels (fewer (panel, tile) groups → ~25% less slot
    padding at products scale, r5). Returns [n_pad, H·D]."""
    out, _ = _gat_fwd(H, D, alpha, attn_drop, panel_rows, panel_rows_bw,
                      r_tile, exact_scores, sd, ss, h2, ar, al, seed,
                      fw_col, fw_row, fw_ones, fw_ct, fw_orig, fw_bp,
                      bw_col, bw_row, bw_ones, bw_ct, bw_orig, bw_bp)
    return out


def gat_fused(H: int, D: int, alpha: float, attn_drop: float,
              sd, ss, h2, ar, seed,
              fw_col, fw_row, fw_ones, fw_ct, fw_orig,
              bw_col, bw_row, bw_ones, bw_ct, bw_orig):
    """Single-panel convenience wrapper around :func:`gat_fused_p` (the
    single-shot path never reads ``al`` — a zero placeholder rides along)."""
    zb = jnp.zeros(0, jnp.int32)
    return gat_fused_p(H, D, alpha, attn_drop, 0, 0, R_TILE, False,
                       sd, ss, h2, ar, jnp.zeros_like(ar), seed,
                       fw_col, fw_row, fw_ones, fw_ct, fw_orig, zb,
                       bw_col, bw_row, bw_ones, bw_ct, bw_orig, zb)


def _gat_t2(sd, dagg, dden):
    """The one COMPACT node table the backward passes share:
    T2 = [dagg|dden|sd] (HD+2H lanes). No lane padding: a 144-lane table
    gathers ~2.6× faster than the same table zero-padded to 256
    (microbench_gather6), and the kernels extract pieces with in-register
    selection matmuls instead. (The former T1 = [h2|ss] is gone: passes
    gather h2 directly and recompute the src score half in-register via the
    block-diagonal a_src matrix.) The barrier serializes the table's
    liveness for VMEM staging."""
    return jax.lax.optimization_barrier(
        jnp.concatenate([dagg, dden, sd], axis=1))


def _smax_tab(ssf):
    return jnp.tile(_pad_lanes(jnp.max(ssf, axis=0)[None, :]), (8, 1))


def _drop_base(orig, seed, attn_drop):
    """Per-slot dropout counter: original edge id XOR the step seed — the
    only dropout state that crosses HBM (the mask itself is hashed from this
    in-register inside each pass)."""
    if attn_drop <= 0.0:
        return None
    return jax.lax.bitcast_convert_type(
        jax.lax.bitcast_convert_type(orig, jnp.uint32)
        ^ seed.astype(jnp.uint32), jnp.int32)


def _gat_fwd(H, D, alpha, attn_drop, panel_rows, panel_rows_bw, r_tile,
             exact_scores,
             sd, ss, h2, ar, al, seed,
             fw_col, fw_row, fw_ones, fw_ct, fw_orig, fw_bp,
             bw_col, bw_row, bw_ones, bw_ct, bw_orig, bw_bp):
    n_pad = h2.shape[0]
    HD = H * D
    HDp = -(-HD // F_BLK) * F_BLK
    single = fw_ct.ndim == 1
    h2f = h2.astype(jnp.float32)
    ssf = ss.astype(jnp.float32)
    arf = ar.astype(jnp.float32)
    smax = _smax_tab(ssf)
    cache = None
    if single:
        sdf = sd.astype(jnp.float32)
        node = jax.lax.optimization_barrier(_pad_lanes(sdf))
        base = _drop_base(fw_orig, seed, attn_drop)
        if GAT_SINGLE_LAYOUT in ("h2", "split"):
            # gather h2 ALONE (≤128 physical lanes) and recompute the src
            # score half in-register via ``ar`` — see GAT_SINGLE_LAYOUT
            src_tab = (jax.lax.optimization_barrier(h2f)
                       if GAT_H2_BARRIER else h2f)
            stream = jnp.take(src_tab, fw_col, axis=0, mode="clip")
            outc = _gat_pass("fwd", H, D, alpha, attn_drop, stream, fw_row,
                             fw_ones, node, smax, arf, base, fw_ct, n_pad,
                             r_tile=r_tile, stream_has_ss=False,
                             exact_scores=exact_scores)
        else:
            # v1: one COMPACT [h2|ss] table per phase (136 lanes → padded to
            # 256 physically; falls off the staged-gather path at ~100k)
            src_tab = jax.lax.optimization_barrier(
                jnp.concatenate([h2f, ssf], axis=1))
            stream = jnp.take(src_tab, fw_col, axis=0, mode="clip")
            outc = _gat_pass("fwd", H, D, alpha, attn_drop, stream, fw_row,
                             fw_ones, node, smax, arf, base, fw_ct, n_pad,
                             r_tile=r_tile, stream_has_ss=True,
                             exact_scores=exact_scores)
        ws_phys = -(-src_tab.shape[1] // F_BLK) * F_BLK
        if stream.shape[0] * ws_phys * 4 <= GAT_STREAM_CACHE_BYTES:
            cache = stream
    else:
        # blocked (OGB-scale): gather h2 alone, recompute BOTH score halves
        # from it in-register (ss via ``ar`` on the stream side, sd via
        # ``al`` on the node side — node table IS h2). Neither [n_pad, H]
        # score array is read, so neither materialises (16×-lane-padded
        # ≈ 1.25 GB each at products scale).
        h2f = jax.lax.optimization_barrier(h2f)
        alf = al.astype(jnp.float32)
        if GAT_BLOCKED_NODE_SD:
            node = jax.lax.optimization_barrier(
                _pad_lanes(sd.astype(jnp.float32)))
            outc = _gat_apply("fwd", H, D, alpha, attn_drop, h2f, node,
                              smax, arf, fw_col, fw_row, fw_ones, fw_ct,
                              fw_orig, fw_bp, seed, n_pad, panel_rows,
                              r_tile, src_has_ss=False,
                              exact_scores=exact_scores)
        else:
            outc = _gat_apply("fwd", H, D, alpha, attn_drop, h2f, h2f,
                              smax, arf, fw_col, fw_row, fw_ones, fw_ct,
                              fw_orig, fw_bp, seed, n_pad, panel_rows,
                              r_tile, src_has_ss=False,
                              exact_scores=exact_scores,
                              al=alf, node_is_h2=True)
    den_off = HD if HD + H <= HDp else HDp     # folded den lanes
    den = jnp.maximum(outc[:, den_off:den_off + H], 1e-16)
    out = (outc[:, :HD].reshape(n_pad, H, D)
           / den[:, :, None]).reshape(n_pad, HD).astype(h2.dtype)
    res = (sd if single else None, ss if single else None, h2, ar, al, seed,
           den, out, smax, cache,
           fw_col, fw_row, fw_ones, fw_ct, fw_orig, fw_bp,
           bw_col, bw_row, bw_ones, bw_ct, bw_orig, bw_bp)
    return out, res


def _gat_bwd(H, D, alpha, attn_drop, panel_rows, panel_rows_bw, r_tile,
             exact_scores, res, g):
    (sd, ss, h2, ar, al, seed, den, out, smax, cache,
     fw_col, fw_row, fw_ones, fw_ct, fw_orig, fw_bp,
     bw_col, bw_row, bw_ones, bw_ct, bw_orig, bw_bp) = res
    n_pad = h2.shape[0]
    HD = H * D
    HDp = -(-HD // F_BLK) * F_BLK
    g = g.astype(jnp.float32).reshape(n_pad, H, D)
    h2f = h2.astype(jnp.float32)
    arf = ar.astype(jnp.float32)
    single = fw_ct.ndim == 1

    # node-level grads of the normalised aggregation
    dagg = (g / den[:, :, None]).reshape(n_pad, HD)               # d(num)
    dden = -jnp.sum(g * out.astype(jnp.float32).reshape(n_pad, H, D),
                    axis=2) / den                                  # [n_pad,H]

    # dst-side tables and src table per layout generation:
    #   single v2 — src table is h2 alone; dst side splits into the dagg
    #     table + a narrow [dden|sd] pair table so every gather table stays
    #     ≤128 physical lanes (VMEM-staged; see GAT_SINGLE_V2)
    #   single v1 — src [h2|ss] concat, dst T2 = [dagg|dden|sd]
    #   blocked  — src h2 (panel gathers), dst T2; no sd residual — the dst
    #     score half is recomputed from h2 @ al (a transient the concat
    #     consumes, not a held array)
    if single and GAT_SINGLE_LAYOUT == "split":
        sdf = sd.astype(jnp.float32)
        src_tab = jax.lax.optimization_barrier(h2f)
        dagg_tab = jax.lax.optimization_barrier(dagg)
        ds_tab = jax.lax.optimization_barrier(
            jnp.concatenate([dden, sdf], axis=1))          # [n_pad, 2H]
        base_f = _drop_base(fw_orig, seed, attn_drop)
        stream = (cache if cache is not None
                  else jnp.take(src_tab, fw_col, axis=0, mode="clip"))
        dsd = _gat_pass("dsd", H, D, alpha, attn_drop, stream, fw_row,
                        fw_ones, dagg_tab, smax, arf, base_f, fw_ct, n_pad,
                        r_tile=r_tile, stream_has_ss=False,
                        exact_scores=exact_scores, node2=ds_tab,
                        split_t2=True)[:, :H]
        # phase barrier: serialize the passes' gathers (each sweeps E rows)
        dagg_tab, ds_tab, dsd, src_tab = jax.lax.optimization_barrier(
            (dagg_tab, ds_tab, dsd, src_tab))
        s1 = jnp.take(dagg_tab, bw_col, axis=0, mode="clip")
        s2 = jnp.take(ds_tab, bw_col, axis=0, mode="clip")
        base_b = _drop_base(bw_orig, seed, attn_drop)
        outc = _gat_pass("dsrc", H, D, alpha, attn_drop, s1, bw_row,
                         bw_ones, src_tab, smax, arf, base_b, bw_ct, n_pad,
                         r_tile=r_tile, stream_has_ss=False,
                         exact_scores=exact_scores, stream2=s2,
                         split_t2=True)
    else:
        if single and GAT_SINGLE_LAYOUT == "h2":
            # src table is h2 alone (ss in-register via ar); dst side keeps
            # the one T2 concat table — 2 unique row sweeps total
            sdf = sd.astype(jnp.float32)
            src_tab = (jax.lax.optimization_barrier(h2f)
                       if GAT_H2_BARRIER else h2f)
        elif single:
            sdf = sd.astype(jnp.float32)
            src_tab = jax.lax.optimization_barrier(
                jnp.concatenate([h2f, ss.astype(jnp.float32)], axis=1))
        else:
            # slice al to its H meaningful columns BEFORE the matmul — the
            # full-width product is a [n_pad, 128] (1.25 GB at products)
            # HLO temp that tipped the dropout config over the HBM edge
            alf = al.astype(jnp.float32)[:HD, :H]
            sdf = jax.lax.dot_general(
                h2f, alf, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            src_tab = jax.lax.optimization_barrier(h2f)
        t2 = _gat_t2(sdf, dagg, dden)
        has_ss = single and GAT_SINGLE_LAYOUT == "wide"

        # fw-layout pass (grouping key = dst): the src stream → dsd.
        # Single-shot reuses the forward's cached gathered stream when
        # available; otherwise the pass re-gathers the src table.
        if single and cache is not None:
            base = _drop_base(fw_orig, seed, attn_drop)
            dsd = _gat_pass("dsd", H, D, alpha, attn_drop, cache, fw_row,
                            fw_ones, t2, smax, arf, base, fw_ct, n_pad,
                            r_tile=r_tile, stream_has_ss=has_ss,
                            exact_scores=exact_scores)[:, :H]
        else:
            dsd = _gat_apply("dsd", H, D, alpha, attn_drop, src_tab, t2,
                             smax, arf, fw_col, fw_row, fw_ones, fw_ct,
                             fw_orig, fw_bp, seed, n_pad, panel_rows, r_tile,
                             src_has_ss=has_ss,
                             exact_scores=exact_scores)[:, :H]

        # phase barrier: serialize the two passes' gathers ("single" =
        # single-shot layouts only; the blocked path measured faster
        # unserialized on the r5 per-direction-panel layout)
        if GAT_PHASE_BARRIER is True or (GAT_PHASE_BARRIER == "single"
                                         and single):
            t2, dsd, src_tab = jax.lax.optimization_barrier(
                (t2, dsd, src_tab))

        # bw-layout pass (grouping key = src): gather T2 → dh2+dss. The bw
        # layout may carry its OWN panel size (T2 rows are a tile wider
        # than h2's — see gat_fused_p docstring).
        outc = _gat_apply("dsrc", H, D, alpha, attn_drop, t2, src_tab, smax,
                          arf, bw_col, bw_row, bw_ones, bw_ct, bw_orig,
                          bw_bp, seed, n_pad,
                          (panel_rows_bw or panel_rows), r_tile,
                          src_has_ss=has_ss, exact_scores=exact_scores)
    den_off = HD if HD + H <= HDp else HDp
    dh2 = outc[:, :HD]
    dss = outc[:, den_off:den_off + H]

    z = jnp.zeros_like
    dsd = dsd.astype(sd.dtype if single else h2.dtype)
    dss = dss.astype(ss.dtype if single else h2.dtype)
    return (dsd, dss, dh2.astype(h2.dtype),
            z(ar), z(al), z(seed),
            z(fw_col), z(fw_row), z(fw_ones), z(fw_ct), z(fw_orig), z(fw_bp),
            z(bw_col), z(bw_row), z(bw_ones), z(bw_ct), z(bw_orig), z(bw_bp))


def _gat_fwd_vjp(H, D, alpha, attn_drop, panel_rows, panel_rows_bw, r_tile,
                 exact_scores, *args):
    return _gat_fwd(H, D, alpha, attn_drop, panel_rows, panel_rows_bw,
                    r_tile, exact_scores, *args)


gat_fused_p.defvjp(_gat_fwd_vjp, _gat_bwd)
