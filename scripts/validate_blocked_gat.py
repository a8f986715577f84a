"""TPU validation: the blocked+paneled fused-GAT path (the ogbn-products
machinery) against the XLA tier at a scale where source panels actually
engage (> ~166k padded rows). CPU interpret tests cover toy shapes; this
drives the REAL kernels on the chip.

Usage: python scripts/validate_blocked_gat.py [--nodes 400000]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nodes", type=int, default=400_000)
    ap.add_argument("--avg-degree", type=int, default=15)
    ap.add_argument("--heads", type=int, default=8)
    ap.add_argument("--dim", type=int, default=16)
    ap.add_argument("--r-tile", type=int, default=256)
    args = ap.parse_args()

    import time

    import jax
    import jax.numpy as jnp
    import numpy as np

    # settle after backend attach: the relay deadlocks when the first device
    # op arrives immediately (microbench_gather7.py:186, CLAUDE.md)
    if jax.devices()[0].platform != "cpu":
        time.sleep(30)
        print("post-attach settle done", flush=True)

    from cogdl_tpu import ops
    from cogdl_tpu.ops import segment as seg
    from cogdl_tpu.datasets.synthetic import powerlaw_graph_device
    from cogdl_tpu.ops.pallas.device_layout import prepare_spmm_device
    from cogdl_tpu.ops.pallas.segment_kernels import build_ar, gat_fused_p

    H, D = args.heads, args.dim
    g = powerlaw_graph_device(args.nodes, avg_degree=args.avg_degree,
                              feat_dim=8, pad_multiple=256)
    g = prepare_spmm_device(g, symmetric=True, with_orig=True,
                            r_tile=args.r_tile)
    pr = int(g.meta_get("spmm_panel_rows"))
    print(f"n_pad={g.n_pad} E={g.num_edges} panel_rows={pr} "
          f"(panels {'ENGAGED' if pr else 'OFF — raise --nodes'})")

    n = g.n_pad
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
    h2 = jax.random.normal(k1, (n, H * D), jnp.float32) * 0.5
    a_dst = jax.random.normal(k2, (H, D), jnp.float32) * 0.3
    a_src = jax.random.normal(k3, (H, D), jnp.float32) * 0.3
    # blocked layouts recompute BOTH score halves from h2 in-kernel —
    # sd/ss are derived quantities here (sd is consumed only for shapes,
    # ss only for the softmax bound)
    sd = jnp.einsum("nhd,hd->nh", h2.reshape(n, H, D), a_dst)
    ss = jnp.einsum("nhd,hd->nh", h2.reshape(n, H, D), a_src)
    ar = build_ar(a_src, H, D)
    al = build_ar(a_dst, H, D)
    ex = g.extras
    zb = jnp.zeros(0, jnp.int32)
    zf = jnp.zeros(0, jnp.float32)

    r_tile = int(g.meta_get("spmm_r_tile"))

    # everything big rides as ARGUMENTS (the remote-compile relay 413s on
    # programs with multi-hundred-MB captured constants)
    def fused(sd, ss, h2, gg, arr, all_, exact=False):
        e = gg.extras
        out = gat_fused_p(
            H, D, 0.2, 0.0, pr,
            int(g.meta_get('spmm_panel_rows_bw', pr)), r_tile, exact,
            sd, ss, h2, arr, all_, jnp.uint32(0),
            e["spmm_fw_pack"], zb, zf, e["spmm_fw_ct"], zb,
            e.get("spmm_fw_bp", zb),
            e["spmm_bw_pack"], zb, zf, e["spmm_bw_ct"], zb,
            e.get("spmm_bw_bp", zb))
        return out.reshape(n, H, D)

    def ref_fwd(sd, ss, h2, gg):
        """Per-head XLA reference: a [E, H, D] message tensor physically
        pads D=16 to 128 lanes (8x, 26 GB at this scale) — loop heads and
        keep every per-edge tensor 1-tile instead."""
        e = jnp.take(sd, gg.row, axis=0) + jnp.take(ss, gg.col, axis=0)
        e = jax.nn.leaky_relu(e, 0.2)
        att = ops.edge_softmax(gg, e)                    # [E, H]
        h3 = h2.reshape(n, H, D)
        outs = []
        for hh in range(H):
            msg = jnp.take(h3[:, hh, :], gg.col, axis=0) * att[:, hh, None]
            outs.append(seg.segment_sum(msg, gg.row, n, sorted=True))
        return jnp.stack(outs, axis=1)                   # [n, H, D]

    import functools as _ft

    @_ft.partial(jax.jit, static_argnums=(6,))
    def fwd_pair(sd, ss, h2, gg, arr, all_, exact):
        return (fused(sd, ss, h2, gg, arr, all_, exact),
                ref_fwd(sd, ss, h2, gg))

    out_f, out_r = fwd_pair(sd, ss, h2, g, ar, al, True)
    a, b = np.asarray(out_f), np.asarray(out_r)
    scale = np.maximum(np.abs(b), 1e-3)
    rel = np.abs(a - b) / scale
    err = float(np.max(rel))
    ab = np.abs(a - b)
    print(f"forward max rel err: {err:.2e}")
    print(f"abs err: max {ab.max():.2e} p99.9 {np.quantile(ab, 0.999):.2e} "
          f"mean {ab.mean():.2e}; out scale p50 {np.median(np.abs(b)):.2e}")
    print(f"rel quantiles: p99 {np.quantile(rel, 0.99):.2e} "
          f"p99.9 {np.quantile(rel, 0.999):.2e}")
    bad = np.argwhere(rel > 1e-2)
    if bad.size:
        rows = np.unique(bad[:, 0])
        print(f"bad elements: {bad.shape[0]} over {rows.size} rows; "
              f"row range [{rows.min()}, {rows.max()}]; "
              f"heads {sorted(set(bad[:, 1].tolist()))[:8]}")
        tile = rows // int(g.meta_get("spmm_r_tile"))
        print("bad tiles (first 12):", np.unique(tile)[:12].tolist())
        pr_ = int(g.meta_get("spmm_panel_rows")) or n
        print("bad rows per panel:",
              np.bincount(rows // pr_, minlength=-(-n // pr_)).tolist())
        r0 = int(rows[0])
        print(f"sample row {r0}: fused={a[r0,0,:4]} ref={b[r0,0,:4]}")

    # gradient sanity at scale: train through the blocked path; a loss that
    # drops monotonically-ish implies usable gradients (exact grad parity is
    # covered by the CPU interpret tests at toy scale)
    import optax

    w_ = jax.random.normal(jax.random.PRNGKey(9), (n, H, D), jnp.float32)
    tx = optax.adam(5e-2)

    @jax.jit
    def step(params, opt, gg, w):
        def loss_fn(args):
            a_dst, a_src, h2 = args
            h3 = h2.reshape(n, H, D)
            sd = jnp.einsum("nhd,hd->nh", h3, a_dst)
            ss = jnp.einsum("nhd,hd->nh", h3, a_src)
            mask = gg.node_mask()[:, None, None]
            return jnp.mean(jnp.where(
                mask,
                (fused(sd, ss, h2, gg, build_ar(a_src, H, D),
                       build_ar(a_dst, H, D)) - w) ** 2, 0.0))

        loss, grads = jax.value_and_grad(loss_fn)(params)
        upd, opt = tx.update(grads, opt, params)
        return optax.apply_updates(params, upd), opt, loss

    params = (a_dst, a_src, h2)
    opt = tx.init(params)
    losses = []
    for _ in range(6):
        params, opt, loss = step(params, opt, g, w_)
        losses.append(float(loss))
    print("train losses:", " ".join(f"{v:.5f}" for v in losses))
    # thresholds per the measured error class (exact_scores kernels, 400k,
    # TPU 2026-08-20): abs err max 3.8e-6 on outputs with p50 |y| ~ 0.11 —
    # the relative metric's floor (1e-3) lets ~µ-scale abs noise on
    # near-zero elements read as ~2e-3 "relative" error, so the abs bound
    # is the meaningful one
    ok = (err < 5e-3 and float(ab.max()) < 1e-4
          and losses[-1] < losses[0] * 0.98)
    print("PASS" if ok else "FAIL")


if __name__ == "__main__":
    main()
