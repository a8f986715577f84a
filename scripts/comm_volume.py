"""Exact per-step communication volume per distributed-SpMM strategy.

Round-4 deliverable (VERDICT r3 "next" #7): real multi-chip hardware is not
reachable from this environment, but the BYTES each strategy moves per train
step are exactly computable on the 8-virtual-device mesh — which makes the
BASELINE.json ">=80% scaling efficiency 1->N" claim falsifiable before
hardware exists.

Per SpMM pass on a P-shard destination partition of a graph with Nl rows
per shard and F f32 feature lanes:
  * all-gather       rows = P*(P-1)*Nl           (every shard receives all
                                                  other shards' features)
  * ring (ppermute)  rows = P*(P-1)*Nl           (x_local makes P-1 hops)
  * boundary all2all rows = sum_pq |halo(p,q)|   (exact) padded to P^2*Hp
                                                  (the static all_to_all)

A 2-layer GCN train step runs 2 forward SpMMs + 2 transposed backward SpMMs
= 4 exchanges (backward moves the SAME rows in reverse).

The scaling model: with per-chip compute time t_c (measured single-chip) and
ICI bandwidth B, step(P) ~ max(t_c/P, overlap) + bytes(P)/(P*B) when halo
exchange is not overlapped; efficiency(P) = t(1)/(P*t(P)). The script prints
the bytes and the break-even step time k*halo_MB/B for a range of B.

Emits one JSON document (COMM_VOLUME_r05.json).
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    from cogdl_tpu.data.graph import add_self_loops, reorder, sym_norm
    from cogdl_tpu.datasets.synthetic import powerlaw_graph
    from cogdl_tpu.parallel.halo import halo_comm_volume, partition_graph_halo

    N, deg, F = 50_000, 20, 128
    g = reorder(sym_norm(add_self_loops(
        powerlaw_graph(N, avg_degree=deg, feat_dim=F))), "random")
    bytes_per_row = F * 4
    spmm_per_step = 4  # 2-layer GCN: 2 fwd + 2 bwd exchanges

    rows = {}
    out = {"graph": f"powerlaw-{N}x{deg}-shuffled", "feat_dim": F,
           "spmm_exchanges_per_step": spmm_per_step, "strategies": {}}
    for P in (2, 4, 8):
        stacked = partition_graph_halo(g, P, method="bfs")
        vol = halo_comm_volume(stacked)
        Nl = stacked.meta_get("halo_nl")
        ag_rows = P * (P - 1) * Nl
        entry = {
            "all_gather_rows": ag_rows,
            "ring_rows": ag_rows,
            "halo_rows_exact": vol["halo_rows_exact"],
            "halo_rows_padded": vol["halo_rows_padded"],
            "all_gather_MB_per_step": round(
                ag_rows * bytes_per_row * spmm_per_step / 1e6, 2),
            "halo_MB_per_step": round(
                vol["halo_rows_padded"] * bytes_per_row * spmm_per_step / 1e6,
                2),
            "halo_vs_allgather": round(
                vol["halo_rows_padded"] / ag_rows, 4),
        }
        out["strategies"][str(P)] = entry
        rows[P] = entry

    # monotonicity: total exchanged rows grow with P for every strategy
    for key in ("all_gather_rows", "halo_rows_padded", "halo_rows_exact"):
        vals = [rows[P][key] for P in (2, 4, 8)]
        assert vals == sorted(vals), (key, vals)

    # scaling model against the measured single-chip step times
    # (BENCH_r04: GCN 100k = 23.44 ms; BENCH_GCN_PRODUCTS_r04: 1211 ms).
    # per-chip halo bytes scale ~1/P of the total; efficiency(P) =
    # t_c/P / (t_c/P + halo_bytes_per_chip/B)
    models = {}
    for label, t_c_ms, scale in (("gcn-100k", 23.44, 100_000 / N),
                                 ("gcn-products", 1211.0, 2_450_000 / N)):
        per = {}
        for P in (2, 4, 8):
            # halo rows grow ~linearly with graph size at fixed P
            halo_bytes = (rows[P]["halo_rows_padded"] * bytes_per_row *
                          spmm_per_step * scale)
            per_chip = halo_bytes / P
            eff = {}
            for B_GBs in (10, 45, 100):
                t_comm_ms = per_chip / (B_GBs * 1e9) * 1e3
                t_comp_ms = t_c_ms / P
                eff[f"B={B_GBs}GB/s"] = round(
                    t_comp_ms / (t_comp_ms + t_comm_ms), 3)
            per[str(P)] = eff
        models[label] = per
    out["efficiency_model"] = models
    out["model_note"] = (
        "efficiency(P) = (t_c/P) / (t_c/P + halo_bytes_per_chip/B), no "
        "overlap assumed (worst case); >=0.8 whenever t_c/P >= "
        "4*halo_bytes_per_chip/B. ICI bandwidth B is a parameter — "
        "the 45 GB/s column is a v5e-class planning number, not a "
        "measurement from this environment (no multi-chip hardware).")

    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "COMM_VOLUME_r05.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))
    print("wrote", path)


if __name__ == "__main__":
    main()
