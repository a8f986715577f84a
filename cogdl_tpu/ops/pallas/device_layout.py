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
    panel_rows: int = 0,
    exact_chunks: int = 0,
    block_chunks: int = BLOCK_CHUNKS,
    r_tile: int = R_TILE,
    drop_empty_groups: bool = False,
) -> Dict[str, jnp.ndarray]:
    """Jittable equivalent of ``build_spmm_layout``: group edges by
    destination-row tile, sort within tile by source column (gather
    locality), pad each tile's edge list to whole chunks.

    ``row`` need NOT be pre-sorted (the lexicographic sort handles it).
    Returns the same keys as the host builder; slot arrays have the static
    worst-case length ``round_up(E + n_groups·T_CHUNK, block)``.

    ``panel_rows > 0`` additionally groups edges by source panel
    (``col // panel_rows``, major sort key): column indices become
    PANEL-LOCAL, every panel's chunk range is padded to whole mega-blocks,
    and a ``block_panel`` map is emitted — the streamed driver then gathers
    each block from a ≤VMEM-sized slice of the feature table (~4× faster
    than whole-table row DMA at ogbn-products scale).
    """
    assert n_pad % r_tile == 0, (n_pad, r_tile)
    n_tiles = n_pad // r_tile
    E = row.shape[0]
    row = row.astype(jnp.int32)
    col = col.astype(jnp.int32)
    weight = weight.astype(jnp.float32)

    block_slots = block_chunks * T_CHUNK
    tile = row // r_tile
    orig = jnp.arange(E, dtype=jnp.int32)

    if panel_rows <= 0:
        # single panel: group = dst tile, every tile gets ≥ 1 chunk so the
        # one-shot kernel writes every output tile
        n_panels, n_groups = 1, n_tiles
        gid = tile
        min_chunks = 1
        E_k_raw = E + n_groups * T_CHUNK
        E_k = (_round_up(E_k_raw, block_slots)
               if E_k_raw > block_slots else _round_up(E_k_raw, T_CHUNK))
    else:
        assert panel_rows % r_tile == 0, panel_rows
        n_panels = -(-n_pad // panel_rows)
        n_groups = n_panels * n_tiles
        gid = (col // panel_rows) * n_tiles + tile
        # legacy-slab constraint: every (panel, tile) group gets ≥ 1 chunk
        # even when empty — the slab driver's local output buffer covers
        # block_chunks CONSECUTIVE tiles, so skipped tiles would let a
        # block's tile span exceed it. The ALIASED-ACCUMULATION drivers
        # (SPMM_BLOCK_ACCUM, r4 default) write at ABSOLUTE tile offsets and
        # have no such constraint: ``drop_empty_groups`` removes the pad
        # chunk per empty group (r5 — at products-GAT panel counts the
        # empties alone were ~10% of all slots). Layouts built with it are
        # VALID ONLY for the accum drivers.
        min_chunks = 0 if drop_empty_groups else 1
        # worst case: per-group quantisation + per-panel block alignment
        E_k = _round_up(E + n_groups * T_CHUNK + n_panels * block_slots,
                        block_slots)
    if exact_chunks:
        # caller measured the true chunk total (count_layout_chunks) — avoid
        # allocating the static worst case (matters at 100M+ edges)
        E_k = exact_chunks * T_CHUNK
    n_chunks = E_k // T_CHUNK

    # three sort keys: (group, col, row). col gives gather locality; row as
    # tertiary key makes the slot stream FULLY deterministic — a transposed
    # build of a symmetric edge set then produces the identical
    # col/row/w/ct arrays slot-for-slot (prepare_spmm_device relies on this
    # to share one layout between directions and keep only two orig maps;
    # true duplicate edges remain interchangeable).
    gid_s, col_s, row_s, w_s, orig_s = jax.lax.sort(
        (gid, col, row, weight, orig), num_keys=3, is_stable=True)

    ones = jnp.ones(E, jnp.int32)
    counts = jax.ops.segment_sum(ones, gid_s, num_segments=n_groups,
                                 indices_are_sorted=True)
    chunks_per_group = jnp.maximum((counts + T_CHUNK - 1) // T_CHUNK,
                                   min_chunks)
    if panel_rows > 0:
        # pad each panel's chunk total up to whole mega-blocks by growing its
        # LAST group's chunk count (pad slots carry w=0 → no-ops)
        per_panel = chunks_per_group.reshape(n_panels, n_tiles)
        totals = per_panel.sum(axis=1)
        deficit = (-totals) % block_chunks
        chunks_per_group = (per_panel.at[:, n_tiles - 1].add(deficit)
                            ).reshape(-1)

    zero = jnp.zeros(1, jnp.int32)
    group_chunk_start = jnp.concatenate(
        [zero, jnp.cumsum(chunks_per_group)]).astype(jnp.int32)
    starts_padded = group_chunk_start * T_CHUNK              # [n_groups+1]
    starts_real = jnp.concatenate([zero, jnp.cumsum(counts)])

    pos = (jnp.take(starts_padded, gid_s)
           + (jnp.arange(E, dtype=jnp.int32) - jnp.take(starts_real, gid_s)))
    if panel_rows > 0:
        col_s = col_s - (gid_s // n_tiles) * panel_rows      # panel-local
    col_k = jnp.zeros(E_k, jnp.int32).at[pos].set(col_s, unique_indices=True)
    w_k = jnp.zeros(E_k, jnp.float32).at[pos].set(w_s, unique_indices=True)
    row_k = jnp.zeros(E_k, jnp.int32).at[pos].set(row_s, unique_indices=True)

    # chunk_tile[c]: mark each group's first chunk with its tile, then
    # forward-fill (handles empty groups, per-panel pad chunks, and the tail;
    # tiles may RESET across panels — monotonicity is only required within a
    # mega-block, and blocks never straddle panels)
    group_tile = jnp.arange(n_groups, dtype=jnp.int32) % n_tiles
    has_chunks = chunks_per_group > 0
    marks = jnp.full(n_chunks, -1, jnp.int32).at[
        jnp.where(has_chunks, group_chunk_start[:-1], n_chunks)
    ].set(group_tile, mode="drop")
    ct = jax.lax.associative_scan(
        lambda a, b: jnp.where(b >= 0, b, a), marks)
    ct = jnp.where(ct < 0, 0, ct)
    # pad slots (w=0) contribute nothing, but keep their row_k inside their
    # own chunk's tile so block-rebasing never produces negative tile spans
    slot_chunk = jnp.arange(E_k, dtype=jnp.int32) // T_CHUNK
    slot_used = jnp.zeros(E_k, jnp.bool_).at[pos].set(True,
                                                      unique_indices=True)
    row_k = jnp.where(slot_used, row_k, jnp.take(ct, slot_chunk) * r_tile)

    out = {"col_k": col_k, "w_k": w_k, "row_k": row_k, "chunk_tile": ct}
    if panel_rows > 0:
        group_panel = jnp.arange(n_groups, dtype=jnp.int32) // n_tiles
        pmarks = jnp.full(n_chunks, -1, jnp.int32).at[
            jnp.where(has_chunks, group_chunk_start[:-1], n_chunks)
        ].set(group_panel, mode="drop")
        cp = jax.lax.associative_scan(
            lambda a, b: jnp.where(b >= 0, b, a), pmarks)
        cp = jnp.where(cp < 0, 0, cp)
        out["block_panel"] = cp[::block_chunks]
        # emit blocked 2-D shapes: a call-time 1-D→2-D reshape is a tiling
        # relayout (T(1024) → T(8,128)) that costs multi-GB resident temps
        n_blocks = n_chunks // block_chunks
        S = block_chunks * T_CHUNK
        out["col_k"] = col_k.reshape(n_blocks, S)
        out["w_k"] = w_k.reshape(n_blocks, S)
        out["row_k"] = row_k.reshape(n_blocks, S)
        out["chunk_tile"] = ct.reshape(n_blocks, block_chunks)
    if with_orig:
        orig_k = jnp.full(E_k, -1, jnp.int32).at[pos].set(
            orig_s, unique_indices=True)
        if panel_rows > 0:
            orig_k = orig_k.reshape(out["col_k"].shape)
        out["orig_k"] = orig_k
    if panel_rows > 0 and with_orig:
        # packed slot stream for the fused-GAT blocked path: one int32 per
        # slot carries (panel-local col | row offset within the dst tile |
        # validity bit) — a third of the col+row+ones footprint (~2.8 GB at
        # ogbn-products). The fw and bw streams of a symmetric edge set are
        # identical, so prepare_spmm_device stores ONE pack array.
        assert panel_rows <= (1 << 18), panel_rows
        assert r_tile <= 1024, r_tile   # 10-bit offset field
        # row_k lies in [ct·r_tile, ct·r_tile + r_tile) (pad slots exactly
        # ct·r_tile), so the offset is a plain modulo — no per-slot lookup
        off = row_k % r_tile
        pack = (col_k | (off << 18)
                | slot_used.astype(jnp.int32) << 28)
        out["pack_k"] = pack.reshape(out["col_k"].shape)
    return out


def count_layout_chunks(row, col, n_pad: int, panel_rows: int,
                        block_chunks: int = BLOCK_CHUNKS,
                        r_tile: int = R_TILE,
                        drop_empty_groups: bool = False) -> int:
    """Measure the exact chunk total the panel layout will need (one scalar
    readback) so the builder can allocate exactly instead of worst-case."""
    n_tiles = n_pad // r_tile

    @jax.jit
    def total(row, col):
        tile = row.astype(jnp.int32) // r_tile
        if panel_rows > 0:
            n_panels = -(-n_pad // panel_rows)
            gid = (col.astype(jnp.int32) // panel_rows) * n_tiles + tile
            n_groups = n_panels * n_tiles
            minc = 0 if drop_empty_groups else 1   # see builder
        else:
            gid, n_groups, minc, n_panels = tile, n_tiles, 1, 1
        counts = jax.ops.segment_sum(jnp.ones_like(gid), gid,
                                     num_segments=n_groups)
        cpg = jnp.maximum((counts + T_CHUNK - 1) // T_CHUNK, minc)
        if panel_rows > 0:
            per_panel = cpg.reshape(n_panels, n_tiles).sum(axis=1)
            per_panel = per_panel + ((-per_panel) % block_chunks)
            return per_panel.sum()
        return cpg.sum()

    nc = int(total(row, col))
    if panel_rows <= 0 and nc > block_chunks:
        # single-panel layouts bigger than one mega-block must stay block-
        # aligned or the dispatcher's streamed path can't take them (the
        # one-shot path would materialise the full message stream)
        nc += (-nc) % block_chunks
    return nc


def default_panel_rows(n_pad: int, feat_bytes: int = 512,
                       budget_mb: int = 96, r_tile: int = R_TILE) -> int:
    """Panel height whose feature slice fits the VMEM staging budget; 0
    (single panel / no paneling) when the whole table already fits."""
    rows_budget = (budget_mb * 1_000_000) // feat_bytes
    if n_pad <= rows_budget:
        return 0
    n_panels = -(-n_pad // rows_budget)
    return _round_up(-(-n_pad // n_panels), r_tile)


def prepare_spmm_device(graph, symmetric: bool = False,
                        with_orig: bool = False,
                        panel_rows: Optional[int] = None,
                        gather_bf16: bool = False,
                        r_tile: int = R_TILE,
                        store_w: Optional[bool] = None,
                        with_dropout: bool = False,
                        block_chunks: int = BLOCK_CHUNKS,
                        drop_empty_groups: Optional[bool] = None,
                        panel_rows_bw: Optional[int] = None):
    """Device-side ``prepare_spmm``: attach kernel layouts built on the
    accelerator. ``symmetric=True`` (undirected graph with symmetric
    normalisation, i.e. Aᵀ = A) shares the forward layout with the backward
    pass — half the build time and half the HBM. With ``with_orig`` the
    slot→edge maps still differ per direction (slot s read transposed is a
    DIFFERENT original edge), so only the two ``orig`` arrays are kept
    separate; col/row/w/ct buffers are aliased.

    ``with_orig=True`` additionally stores the slot→original-edge map the
    fused GAT path needs (costs one more E_k-sized array). Blocked (paneled)
    with_orig layouts derive slot validity from ``orig ≥ 0`` in-stream, so no
    ``ones`` array is stored.

    ``store_w`` (default: ``not with_orig``): keep the per-slot weight
    stream. The fused GAT path never reads weights — at products scale the
    two w streams are ~1.7 GB of HBM. Without it, the plain ``spmm``
    dispatcher falls back to the XLA tier on this graph (guarded, correct,
    slow) — set ``store_w=True`` for models that mix attention with plain
    aggregation on one graph.

    Blocked (paneled) with_orig layouts store a single PACKED int32 slot
    stream (panel-local col | dst-tile row offset | validity) shared by both
    directions. Attention dropout needs NO stored state on this path — the
    kernels hash masks from each slot's (dst, src) coordinates in-register
    (the ~1.8 GB of per-direction orig maps this used to cost at products
    scale are gone); ``with_dropout`` is accepted for compatibility and
    ignored.

    ``panel_rows`` (None → auto from the node count): source-panel layouts
    for huge graphs — see :func:`build_spmm_layout_jax`."""
    n_pad = graph.n_pad
    assert n_pad % r_tile == 0, (
        f"pad the graph to a multiple of {r_tile} rows first "
        f"(data.graph.pad_to); got n_pad={n_pad}")
    E = graph.num_edges
    row, col, w = graph.row[:E], graph.col[:E], graph.edge_weight[:E]
    if panel_rows is None:
        # size panels by PHYSICAL bytes/row: lanes pad to whole 128-lane
        # tiles, so the fused-GAT path's 144-lane node tables occupy 256
        # lanes = 1024 B/row. Sizing by the 576 logical bytes made 168 MB
        # slices that fell off the VMEM staging path — the dominant gather
        # ran at ~14 ns/row vs ~2 staged (r4 on-chip profile; panel sweep
        # measured 163840 rows → 7549 ms, 92160 → 7199, and mid-sized
        # 116736 → 9436: off-staging AND more groups is worst of both)
        feat_bytes = (1024 if with_orig
                      else (256 if gather_bf16 else 512))
        panel_rows = default_panel_rows(n_pad, feat_bytes=feat_bytes,
                                        r_tile=r_tile)

    if store_w is None:
        store_w = not with_orig
    if drop_empty_groups is None:
        # empty (panel, tile) groups need a pad chunk ONLY for the legacy
        # local-slab drivers; the aliased-accumulation default writes at
        # absolute tile offsets, so the empties' chunks are pure waste
        # (~10% of all slots at products-GAT panel counts)
        from .segment_kernels import SPMM_BLOCK_ACCUM

        drop_empty_groups = SPMM_BLOCK_ACCUM

    # per-direction panel sizing (r5): the GAT backward's src-grouped pass
    # gathers the [dagg|dden|sd] table, one 128-lane tile WIDER than h2 —
    # sizing its panels separately lets the four h2-gathering sweeps use
    # ~2x bigger panels (fewer (panel, tile) groups → less slot padding)
    if panel_rows_bw is None:
        panel_rows_bw = panel_rows

    build = jax.jit(build_spmm_layout_jax,
                    static_argnames=("n_pad", "with_orig", "panel_rows",
                                     "exact_chunks", "block_chunks",
                                     "r_tile", "drop_empty_groups"))

    def build_dir(r, c, pr):
        nc = count_layout_chunks(r, c, n_pad, pr, r_tile=r_tile,
                                 block_chunks=block_chunks,
                                 drop_empty_groups=drop_empty_groups)
        return build(r, c, w, n_pad=n_pad, with_orig=with_orig,
                     panel_rows=pr, exact_chunks=nc, r_tile=r_tile,
                     block_chunks=block_chunks,
                     drop_empty_groups=drop_empty_groups)

    fwd = build_dir(row, col, panel_rows)
    # symmetric layout sharing is valid for plain SpMM, but the fused-GAT
    # path (with_orig) keys dropout masks on original edge ids, and slot s
    # read transposed is a *different* original edge — for a symmetric edge
    # set the transposed layout's col/row/w/ct come out IDENTICAL (same
    # sorted (group, col) stream), so only its orig map is kept (the rest of
    # the second build is transient and freed)
    if symmetric and with_orig:
        if panel_rows > 0 and panel_rows_bw == panel_rows:
            # packed layouts never store orig (dropout masks are hashed
            # from slot coordinates in-kernel) — skip the entire
            # transposed build (a second full-edge device sort)
            bwd = fwd
        elif panel_rows > 0:
            # per-direction panel sizes: the transposed layout must be
            # built at ITS panel size (no aliasing — costs one pack array)
            bwd = build_dir(col, row, panel_rows_bw)
        else:
            bwd = {**fwd, "orig_k": build_dir(col, row,
                                              panel_rows)["orig_k"]}
    elif symmetric:
        bwd = fwd
    else:
        bwd = build_dir(col, row, panel_rows_bw)

    # re-preparing a graph must not leave stale layout pieces behind: a
    # leftover w/ones/bp stream from an earlier build would be paired with
    # the NEW col/row/ct by the dispatch guards
    extras = {k: v for k, v in (graph.extras or {}).items()
              if not k.startswith("spmm_")}
    packed = with_orig and panel_rows > 0
    if not packed or store_w:
        # the plain spmm route reads col/row/w streams
        extras.update({
            "spmm_fw_col": fwd["col_k"], "spmm_fw_row": fwd["row_k"],
            "spmm_bw_col": bwd["col_k"], "spmm_bw_row": bwd["row_k"],
        })
    extras.update({
        "spmm_fw_ct": fwd["chunk_tile"], "spmm_bw_ct": bwd["chunk_tile"],
    })
    if store_w:
        extras["spmm_fw_w"] = fwd["w_k"]
        extras["spmm_bw_w"] = bwd["w_k"]
    if panel_rows > 0:
        extras["spmm_fw_bp"] = fwd["block_panel"]
        extras["spmm_bw_bp"] = bwd["block_panel"]
    # record dispatch parameters even for single-panel layouts: the kernel
    # must run with the SAME tile height the layout was built with
    graph = graph.with_meta(spmm_panel_rows=panel_rows,
                            spmm_panel_rows_bw=panel_rows_bw,
                            spmm_gather_bf16=bool(gather_bf16),
                            spmm_r_tile=r_tile,
                            spmm_drop_empty=bool(drop_empty_groups
                                                 and panel_rows > 0))
    if packed:
        extras["spmm_fw_pack"] = fwd["pack_k"]
        extras["spmm_bw_pack"] = bwd["pack_k"]   # aliased when symmetric
        if panel_rows_bw != panel_rows:
            # WIDE-panel src-grouped layout for narrow backward tables
            # (r5): a GAT layer whose [dagg|dden|sd] table fits one
            # 128-lane tile (HD + 2H ≤ 128, e.g. output layers) can run
            # its dsrc pass on wide panels too — maybe_gat_fused selects
            # per layer. For SYMMETRIC edge sets this layout is
            # bit-identical to the fw build (3-key-sort determinism), so
            # it ALIASES fwd: zero extra memory or build time.
            bw2 = fwd if symmetric else build_dir(col, row, panel_rows)
            extras["spmm_bw2_pack"] = bw2["pack_k"]
            extras["spmm_bw2_ct"] = bw2["chunk_tile"]
            extras["spmm_bw2_bp"] = bw2["block_panel"]
    elif with_orig:
        # 1-D (single-panel) fused-GAT layouts: per-direction orig + ones
        for pre, lay in (("fw", fwd), ("bw", bwd)):
            extras[f"spmm_{pre}_orig"] = lay["orig_k"]
            extras[f"spmm_{pre}_ones"] = (
                lay["orig_k"] >= 0).astype(jnp.float32)
    return graph.replace(extras=extras)
