"""Pallas performance tier for TPU.

``prepare_spmm(graph)`` builds the tile-chunk-padded kernel layouts (host,
once per graph) and stores them in ``graph.extras``; the ``spmm`` dispatcher
then routes through the Pallas sorted-segment-matmul kernel on TPU
(the TPU-idiomatic replacement for GE-SpMM, reference
cogdl/operators/spmm/spmm_kernel.cu).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .segment_kernels import (
    R_TILE,
    build_spmm_layout,
    sorted_segment_matmul,  # noqa: F401  (public kernel-tier re-export)
    spmm_pallas,
)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def prepare_spmm(graph, r_tile: int = R_TILE):
    """Host-side: attach Pallas SpMM layouts (forward + transposed backward)
    to the graph. Call after normalisation — the layouts snapshot
    ``edge_weight``. Returns a new Graph (n_pad rounded to the row tile).

    ``r_tile`` is the dst-row tile height: taller tiles quantise fewer
    (tile → 1024-slot-chunk) groups, so the slot streams the gather engine
    sweeps carry less padding (~13% at 128 vs ~6% at 256 on 100k×30), at
    the cost of proportionally more MXU routing work per chunk."""
    from ...data.graph import pad_to

    n_pad = _round_up(graph.n_pad, r_tile)
    if n_pad != graph.n_pad:
        graph = pad_to(graph, n_pad, graph.e_pad)

    E = graph.num_edges
    row = np.asarray(graph.row)[:E]
    col = np.asarray(graph.col)[:E]
    w = np.asarray(graph.edge_weight)[:E]

    fwd = build_spmm_layout(row, col, w, n_pad, rows_per_tile=r_tile)
    order = np.argsort(col, kind="stable")
    bwd = build_spmm_layout(col[order], row[order], w[order], n_pad,
                            rows_per_tile=r_tile)

    # bwd orig_k indexes the column-sorted edge list; map back to the
    # original edge order so fw/bw dropout masks agree per edge
    bw_orig = np.where(bwd["orig_k"] >= 0, order[bwd["orig_k"]], -1)

    # drop any stale layout pieces from an earlier prepare (see
    # device_layout.prepare_spmm_device) and reset the dispatch meta — this
    # host layout is single-panel at the default tile height
    extras = {k: v for k, v in (graph.extras or {}).items()
              if not k.startswith("spmm_")}
    graph = graph.with_meta(spmm_panel_rows=0, spmm_gather_bf16=False,
                            spmm_r_tile=r_tile)
    extras.update({
        "spmm_fw_orig": jnp.asarray(fwd["orig_k"]),
        "spmm_fw_ones": jnp.asarray((fwd["orig_k"] >= 0).astype(np.float32)),
        "spmm_fw_col": jnp.asarray(fwd["col_k"]),
        "spmm_fw_w": jnp.asarray(fwd["w_k"]),
        "spmm_fw_row": jnp.asarray(fwd["row_k"]),
        "spmm_fw_ct": jnp.asarray(fwd["chunk_tile"]),
        "spmm_bw_orig": jnp.asarray(bw_orig.astype(np.int32)),
        "spmm_bw_ones": jnp.asarray((bwd["orig_k"] >= 0).astype(np.float32)),
        "spmm_bw_col": jnp.asarray(bwd["col_k"]),
        "spmm_bw_w": jnp.asarray(bwd["w_k"]),
        "spmm_bw_row": jnp.asarray(bwd["row_k"]),
        "spmm_bw_ct": jnp.asarray(bwd["chunk_tile"]),
    })
    return graph.replace(extras=extras)


def _is_tpu() -> bool:
    try:
        return jax.devices()[0].platform in ("tpu", "axon")
    except Exception:  # pragma: no cover
        return False


def _check_layout_driver_compat(graph):
    """A drop_empty_groups layout is VALID ONLY for the aliased-accumulation
    drivers: the legacy slab route assumes every (panel, tile) group has a
    chunk (its local buffer spans block_chunks CONSECUTIVE tiles). Catch the
    mismatch loudly instead of silently zeroing rows — bench's
    --no-block-accum A/B flips the flag BEFORE prepare, which is the
    supported order."""
    from .segment_kernels import SPMM_BLOCK_ACCUM

    if graph.meta_get("spmm_drop_empty", False) and not SPMM_BLOCK_ACCUM:
        raise ValueError(
            "this graph's blocked layout was built with drop_empty_groups "
            "(no pad chunk per empty (panel, tile) group) but "
            "SPMM_BLOCK_ACCUM is now False — the legacy slab drivers "
            "require full group coverage. Re-prepare the graph after "
            "setting the flag (prepare_spmm_device(..., "
            "drop_empty_groups=False)).")


def maybe_pallas_spmm(graph, x) -> Optional[jnp.ndarray]:
    """Route through the Pallas kernel when the graph carries prepared
    layouts and we're on TPU; None → caller falls back to XLA segment ops."""
    extras = graph.extras
    if not extras or "spmm_fw_col" not in extras:
        return None
    if "spmm_fw_w" not in extras:
        # layouts prepared with store_w=False (attention-only graphs) carry
        # no weight stream — plain spmm falls back to the XLA tier
        return None
    if x.ndim != 2 or not _is_tpu():
        return None
    panel_rows = graph.meta_get("spmm_panel_rows", 0)
    gather_bf16 = bool(graph.meta_get("spmm_gather_bf16", False))
    r_tile = int(graph.meta_get("spmm_r_tile", R_TILE))
    _check_layout_driver_compat(graph)
    if graph.meta_get("spmm_panel_rows_bw", panel_rows) != panel_rows:
        # per-direction panel sizes are a fused-GAT feature; the plain
        # spmm custom VJP runs both directions at one size — fall back
        return None
    if panel_rows:
        from .segment_kernels import spmm_pallas_p

        return spmm_pallas_p(
            panel_rows, gather_bf16, r_tile, x,
            extras["spmm_fw_col"], extras["spmm_fw_w"],
            extras["spmm_fw_row"], extras["spmm_fw_ct"], extras["spmm_fw_bp"],
            extras["spmm_bw_col"], extras["spmm_bw_w"],
            extras["spmm_bw_row"], extras["spmm_bw_ct"], extras["spmm_bw_bp"],
        )
    if r_tile != R_TILE or gather_bf16:
        # the kernel MUST run at the tile height the layout was built with
        from .segment_kernels import spmm_pallas_p

        zb = jnp.zeros(0, jnp.int32)
        return spmm_pallas_p(
            0, gather_bf16, r_tile, x,
            extras["spmm_fw_col"], extras["spmm_fw_w"],
            extras["spmm_fw_row"], extras["spmm_fw_ct"], zb,
            extras["spmm_bw_col"], extras["spmm_bw_w"],
            extras["spmm_bw_row"], extras["spmm_bw_ct"], zb,
        )
    return spmm_pallas(
        x,
        extras["spmm_fw_col"], extras["spmm_fw_w"],
        extras["spmm_fw_row"], extras["spmm_fw_ct"],
        extras["spmm_bw_col"], extras["spmm_bw_w"],
        extras["spmm_bw_row"], extras["spmm_bw_ct"],
    )


def maybe_gat_fused(graph, score_dst, score_src, h, a_src, a_dst=None,
                    alpha=0.2, attn_drop=0.0, dropout_rng=None,
                    exact_scores: bool = False):
    """Fully fused kernel-tier GAT (scores+softmax+aggregate, custom VJP)
    when both direction layouts are prepared (TPU). ``a_src``/``a_dst`` are
    the attention vectors [H, D] (or [1, H, D]); the kernels gather h alone
    and recompute the src score half in-register from ``a_src`` —
    ``score_src`` must equal ``Σ_d a_src·h`` (it is consumed only for the
    softmax bound). On blocked OGB-scale layouts the dst half is likewise
    recomputed from ``a_dst`` and ``score_dst`` is never read.
    Returns [n_pad, H, D]."""
    extras = graph.extras
    if not extras or not _is_tpu():
        return None
    packed = "spmm_fw_pack" in extras
    if not packed and ("spmm_fw_orig" not in extras
                       or "spmm_bw_orig" not in extras):
        return None
    from .segment_kernels import build_ar, gat_fused_p

    H, D = h.shape[1], h.shape[2]
    ar = build_ar(jnp.asarray(a_src).reshape(H, D), H, D)
    al = (build_ar(jnp.asarray(a_dst).reshape(H, D), H, D)
          if a_dst is not None else jnp.zeros_like(ar))
    if attn_drop > 0.0 and dropout_rng is not None:
        # blocked (packed) layouts hash dropout masks from slot coordinates
        # in-kernel — no orig maps or any other per-edge dropout state
        seed = jax.random.randint(dropout_rng, (), 0, 2**31 - 1,
                                  dtype=jnp.int32).astype(jnp.uint32)
    else:
        attn_drop = 0.0
        seed = jnp.uint32(0)
    panel_rows = int(graph.meta_get("spmm_panel_rows", 0))
    panel_rows_bw = int(graph.meta_get("spmm_panel_rows_bw", panel_rows))
    r_tile = int(graph.meta_get("spmm_r_tile", R_TILE))
    _check_layout_driver_compat(graph)
    zb = jnp.zeros(0, jnp.int32)
    zf = jnp.zeros(0, jnp.float32)
    fw_col = extras["spmm_fw_pack"] if packed else extras["spmm_fw_col"]
    bw_col = extras["spmm_bw_pack"] if packed else extras["spmm_bw_col"]
    bw_ct = extras["spmm_bw_ct"]
    bw_bp = extras.get("spmm_bw_bp", zb)
    if (packed and "spmm_bw2_pack" in extras and H * D + 2 * H <= 128):
        # this layer's [dagg|dden|sd] rows fit one 128-lane tile — its
        # dsrc pass runs on the WIDE-panel src-grouped layout (same slot
        # density as the fw layout; selection is per layer)
        bw_col = extras["spmm_bw2_pack"]
        bw_ct = extras["spmm_bw2_ct"]
        bw_bp = extras["spmm_bw2_bp"]
        panel_rows_bw = panel_rows
    if packed and a_dst is None:
        raise ValueError(
            "blocked fused GAT recomputes the dst score half in-kernel — "
            "pass a_dst to maybe_gat_fused")
    out = gat_fused_p(
        H, D, alpha, float(attn_drop), panel_rows, panel_rows_bw, r_tile,
        bool(exact_scores),
        score_dst, score_src, h.reshape(-1, H * D), ar, al, seed,
        fw_col, extras.get("spmm_fw_row", zb),
        extras.get("spmm_fw_ones", zf),
        extras["spmm_fw_ct"], extras.get("spmm_fw_orig", zb),
        extras.get("spmm_fw_bp", zb),
        bw_col, extras.get("spmm_bw_row", zb),
        extras.get("spmm_bw_ones", zf),
        bw_ct, extras.get("spmm_bw_orig", zb),
        bw_bp)
    return out.reshape(-1, H, D)


def maybe_pallas_mh_spmm(graph, attention, h):
    """GAT aggregation through the kernel when a layout is prepared."""
    extras = graph.extras
    if (not extras or "spmm_fw_orig" not in extras or not _is_tpu()
            or attention.ndim != 2 or h.ndim != 3
            or "spmm_fw_col" not in extras
            or extras["spmm_fw_col"].ndim != 1     # no paneled layouts here
            or int(graph.meta_get("spmm_r_tile", R_TILE)) != R_TILE):
        return None
    from .segment_kernels import mh_spmm_pallas

    return mh_spmm_pallas(
        attention, h, extras["spmm_fw_col"], extras["spmm_fw_orig"],
        extras["spmm_fw_ones"], extras["spmm_fw_row"], extras["spmm_fw_ct"],
        graph.n_pad)



