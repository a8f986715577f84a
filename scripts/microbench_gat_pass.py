"""Pass-level fused-GAT microbenchmark + ablation attribution (round 5).

The r4 profile showed the six fused GAT passes running at 42-70 TF/s vs the
plain SpMM kernel's ~106 on the same layout machinery. This script times
each pass MODE in isolation on a products-shaped blocked layout and, via
segment_kernels.GAT_ABLATE, removes one piece of in-kernel work at a time
(softmax exp, whole score chain, dst-score broadcast matmul, src-score
matmul) to attribute the gap on the real chip before any surgery.

Run DETACHED (never timeout/kill a TPU process):
    setsid nohup python -u scripts/microbench_gat_pass.py > logs_r5/mb_gat.log 2>&1 &
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nodes", type=int, default=1_000_000)
    ap.add_argument("--avg-degree", type=int, default=50)
    ap.add_argument("--heads", type=int, default=8)
    ap.add_argument("--dim", type=int, default=32)   # HD=256 hidden shape
    ap.add_argument("--r-tile", type=int, default=512)
    ap.add_argument("--panel-rows", type=int, default=-1)
    ap.add_argument("--block-chunks", type=int, default=0)
    ap.add_argument("--drop-empty", action="store_true")
    ap.add_argument("--powerlaw", action="store_true",
                    help="Zipf dst popularity (products-like group sizes)")
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--modes", default="fwd,dsd,dsrc,spmm")
    ap.add_argument("--ablate", default="",
                    help="comma list: none|noexp|noscore|nosd|noar (each run "
                    "separately on the fwd pass)")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    print("devices:", jax.devices(), flush=True)
    if not args.cpu:
        time.sleep(30)   # relay settle (CLAUDE.md)
        # tiny probe op first — poisoned relays die here, not mid-bench
        t0 = time.time()
        v = float((jnp.ones((256, 256)) @ jnp.ones((256, 256))).sum())
        print(f"probe ok {v} in {time.time()-t0:.1f}s", flush=True)

    from cogdl_tpu.ops.pallas import segment_kernels as sk
    from cogdl_tpu.ops.pallas.device_layout import (
        build_spmm_layout_jax, count_layout_chunks, default_panel_rows)

    N, deg = args.nodes, args.avg_degree
    H, D = args.heads, args.dim
    HD = H * D
    HDp = -(-HD // sk.F_BLK) * sk.F_BLK
    r_tile = args.r_tile
    n_pad = ((N + r_tile - 1) // r_tile) * r_tile
    E = N * deg

    kr, kc, kh = jax.random.split(jax.random.PRNGKey(0), 3)
    if args.powerlaw:
        # products-like: Zipf(0.8) dst popularity, mirrored (the group-size
        # DISTRIBUTION drives slot quantisation — uniform degrees quantise
        # degenerately and hide layout effects)
        from cogdl_tpu.datasets.synthetic import powerlaw_graph_device

        gsrc = powerlaw_graph_device(N, avg_degree=deg, feat_dim=8,
                                     pad_multiple=r_tile)
        E = gsrc.num_edges
        row, col = gsrc.row[:E], gsrc.col[:E]
        w = jnp.ones((E,), jnp.float32)
        del gsrc
    else:
        # uniform random src/dst
        row = jax.random.randint(kr, (E,), 0, N, jnp.int32)
        col = jax.random.randint(kc, (E,), 0, N, jnp.int32)
        w = jnp.ones((E,), jnp.float32)

    panel_rows = (args.panel_rows if args.panel_rows >= 0 else
                  default_panel_rows(n_pad, feat_bytes=HDp * 4,
                                     r_tile=r_tile))
    if panel_rows == 0:
        panel_rows = n_pad      # single panel, but packed blocked layout
    bc = args.block_chunks or sk.BLOCK_CHUNKS
    nc = count_layout_chunks(row, col, n_pad, panel_rows, r_tile=r_tile,
                             block_chunks=bc,
                             drop_empty_groups=args.drop_empty)
    build = jax.jit(build_spmm_layout_jax,
                    static_argnames=("n_pad", "with_orig", "panel_rows",
                                     "exact_chunks", "r_tile",
                                     "block_chunks", "drop_empty_groups"))
    lay = build(row, col, w, n_pad=n_pad, with_orig=True,
                panel_rows=panel_rows, exact_chunks=nc, r_tile=r_tile,
                block_chunks=bc, drop_empty_groups=args.drop_empty)
    lay = jax.tree.map(lambda a: a.block_until_ready(), lay)
    n_slots = int(np.prod(lay["pack_k"].shape))
    print(f"layout: N={N} E={E} panel_rows={panel_rows} "
          f"slots={n_slots} ({n_slots/E:.3f} slots/edge) "
          f"blocks={lay['pack_k'].shape[0]}", flush=True)

    h2 = jax.random.normal(kh, (n_pad, HD), jnp.float32) * 0.1
    a_src = jax.random.normal(jax.random.PRNGKey(2), (H, D), jnp.float32)
    a_dst = jax.random.normal(jax.random.PRNGKey(3), (H, D), jnp.float32)
    ar = sk.build_ar(a_src, H, D)
    al = sk.build_ar(a_dst, H, D)
    ss = h2 @ ar[:HD, :H]
    smax = sk._smax_tab(ss)
    seed = jnp.uint32(0)

    def run_pass(mode):
        # the layout rides as explicit args — a closure would embed it as
        # program CONSTANTS and the remote-compile relay 413s (CLAUDE.md)
        def one(x, L):
            if mode == "spmm":
                return sk._one_direction(
                    x, L["col_k"], L["w_k"], L["row_k"], L["chunk_tile"],
                    L["block_panel"], panel_rows, r_tile=r_tile)[:, :1]
            return sk._gat_apply(
                mode, H, D, 0.2, 0.0, x, x, smax, ar,
                L["pack_k"], None, None, L["chunk_tile"], None,
                L["block_panel"], seed, n_pad, panel_rows, r_tile,
                exact_scores=False, al=al, node_is_h2=(mode == "fwd"))[:, :1]

        @jax.jit
        def chain(x, L):
            def body(c, _):
                # perturb the input so XLA cannot CSE the iterations
                return one(c + 1e-12, L)[: x.shape[0]] * 0.0 + c, None

            out, _ = jax.lax.scan(body, x, None, length=args.repeats)
            return out.sum()

        # separate warmup program (compile + 1 run), then timed chain
        t0 = time.time()
        _ = float(jax.jit(lambda x, L: one(x, L).sum())(h2, lay))
        t_compile = time.time() - t0
        t0 = time.time()
        _ = float(chain(h2, lay))
        dt = time.time() - t0
        t0 = time.time()
        v = float(chain(h2, lay))
        dt = min(dt, time.time() - t0)
        per = (dt - 0.03) / args.repeats   # subtract ~1 RTT
        # counted flops per cost_estimate (matches the r4 profile's TF/s)
        if mode == "spmm":
            fl = 2 * n_slots * r_tile * HDp
        else:
            Ws = HDp
            Wn = HDp
            Wout = 128 if mode == "dsd" else (
                HDp if HD + H <= HDp else HDp + 128)
            fl = 2 * n_slots * (r_tile * (Ws + Wn + Wout) + 3 * 128 * 128)
        print(f"  {mode:6s}: {per*1e3:8.1f} ms/pass  "
              f"{fl/per/1e12:6.1f} TF/s (counted)  "
              f"[warmup+compile {t_compile:.1f}s, chk {v:.3e}]", flush=True)
        return per

    results = {}
    for mode in args.modes.split(","):
        results[mode] = run_pass(mode)

    for ab in [a for a in args.ablate.split(",") if a and a != "none"]:
        sk.GAT_ABLATE = frozenset(ab.split("+"))
        print(f"ablate={ab}:", flush=True)
        results[f"fwd[{ab}]"] = run_pass("fwd")
        sk.GAT_ABLATE = frozenset()

    out = {"nodes": N, "edges": E, "slots": n_slots, "r_tile": r_tile,
           "H": H, "D": D, "panel_rows": panel_rows,
           "ms_per_pass": {k: round(v * 1e3, 2) for k, v in results.items()}}
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
