"""Benchmark: SpMM-bound GCN training throughput in edges/sec (BASELINE.json
north star — GCN on an ogbn-products-scale power-law graph).

Measures the full jitted train step (forward + backward + Adam) on the default
platform (the real TPU chip under the driver). One JSON line to stdout:
{"metric": ..., "value": ..., "unit": "edges/sec", "vs_baseline": ...}

Timing honesty: steps are chained inside one jit via lax.scan and the final
loss is read back to host — on this remote-device backend,
``block_until_ready()`` does NOT guarantee execution finished; only a value
transfer does.

vs_baseline anchor: 1.0e9 edges/sec — GE-SpMM-class throughput of the
reference's CUDA SpMM on a V100 at feature width ~100 (the reference
publishes no in-repo throughput numbers; see BASELINE.md).
"""

from __future__ import annotations

import argparse
import functools
import json
import time

import jax
import jax.numpy as jnp

BASELINE_EDGES_PER_SEC = 1.0e9


def _mem_stats():
    """Peak device memory if the backend exposes it (bytes), else None."""
    try:
        st = jax.local_devices()[0].memory_stats() or {}
        return st.get("peak_bytes_in_use")
    except Exception:
        return None


def _emit(payload, out=None):
    mem = _mem_stats()
    if mem:
        payload = {**payload, "peak_hbm_bytes": int(mem)}
    line = json.dumps(payload)
    print(line)
    if out:
        with open(out, "w") as f:
            f.write(line + "\n")


def _settle():
    """The axon relay deadlocks when the first device op arrives immediately
    after backend attach (CLAUDE.md) — give it a moment on remote backends."""
    if jax.devices()[0].platform not in ("cpu",):
        time.sleep(30)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="gcn",
                    help="model registry name (gcn, gat, sage, ...)")
    ap.add_argument("--nodes", type=int, default=100_000)
    ap.add_argument("--avg-degree", type=int, default=30)
    ap.add_argument("--feat-dim", type=int, default=100)
    ap.add_argument("--hidden", type=int, default=128)
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--warmup", type=int, default=3)
    ap.add_argument("--repeats", type=int, default=2,
                    help="report the fastest of N timed repeats")
    ap.add_argument("--attn-drop", type=float, default=0.0,
                    help="GAT attention dropout (exercises the in-kernel "
                    "hash-mask path)")
    ap.add_argument("--exact-scores", action="store_true",
                    help="GAT: exact-f32 kernel matmuls (6-pass MXU) "
                    "instead of the default mixed precision")
    ap.add_argument("--bf16", action="store_true",
                    help="bf16 activations (f32 master weights). Measured "
                    "2026-08-21: no longer crashes (prop-cache program) "
                    "but 19x SLOWER (475 vs 24.8 ms - bf16 gather tables "
                    "miss the VMEM-staged path); keep f32 for SpMM-bound "
                    "models on this backend")
    ap.add_argument("--products", action="store_true",
                    help="full ogbn-products scale (2.45M nodes, ~124M "
                    "edges). NOTE: this backend kills device programs over "
                    "~20 s — for GAT at this scale (12 s/step) run with "
                    "--warmup 1 --steps 1 --repeats 3 so each lax.scan "
                    "program stays under the cap (CLAUDE.md)")
    ap.add_argument("--blocked", action="store_true",
                    help="use the blocked source-panel device layouts "
                    "(the --products path: panel gathers at ~2.9 vs ~11 "
                    "ns/row) at ANY scale — A/B vs the single-shot path "
                    "at 100k-400k where tables fall off VMEM staging")
    ap.add_argument("--bf16-gather", action="store_true",
                    help="bf16 gather tables at products scale — MEASURED "
                    "3.7x SLOWER on this backend (bf16 gathers miss the "
                    "VMEM-staged fast path); kept for re-testing")
    ap.add_argument("--r-tile", type=int, default=None,
                    help="dst-tile height for --products layouts; default "
                    "256 at products (cuts chunk-quantisation padding "
                    "344M->212M slots for 2x MXU work per slot), 128 else")
    ap.add_argument("--reorder", default=None,
                    choices=["degree", "bfs", "rcm", "random"],
                    help="relabel nodes before layout build (host-graph "
                    "configs only; note the synthetic generator is born "
                    "degree-ordered — use random to simulate an arbitrary "
                    "real-world labeling, random+degree to A/B recovery)")
    ap.add_argument("--reorder2", default=None,
                    choices=["degree", "bfs", "rcm", "random"],
                    help="second reorder applied after --reorder")
    ap.add_argument("--panel-rows", type=int, default=None,
                    help="source-panel height for --products/--blocked "
                    "layouts (default: auto from the ~96 MB VMEM staging "
                    "budget; must be a multiple of r_tile)")
    ap.add_argument("--panel-rows-bw", type=int, default=None,
                    help="SEPARATE panel height for the src-grouped (GAT "
                    "dsrc) layout — its gather table is one 128-lane tile "
                    "wider than h2 (r5 per-direction sizing; default: auto "
                    "1024 B/row for GAT, same as --panel-rows otherwise)")
    ap.add_argument("--block-chunks", type=int, default=None,
                    help="mega-block size in chunks for blocked layouts "
                    "(default 2048; 512 cuts per-panel block-alignment "
                    "padding ~3x at products for ~4x more scan steps)")
    ap.add_argument("--uniform-panels", action="store_true",
                    help="A/B: legacy single panel size for both GAT "
                    "directions (the r4 layout)")
    ap.add_argument("--act-compress", action="store_true",
                    help="activation compression (ActNN analog): int8 "
                    "per-row-scale dense residuals + bool relu masks in "
                    "the backward (ops/actnn.py) - reports the peak-HBM "
                    "delta story at products scale")
    ap.add_argument("--no-block-accum", action="store_true",
                    help="A/B: disable the in-kernel aliased accumulation "
                    "in the blocked streaming driver (r4)")
    ap.add_argument("--no-prop-cache", action="store_true",
                    help="GCN: disable the exact first-layer propagation "
                    "cache (P = ÂX precomputed once; removes 2 of the 4 "
                    "gather sweeps per train step)")
    ap.add_argument("--remat", action="store_true",
                    help="rematerialise the forward (saves ~2.5 GB HBM at "
                    "products scale, costs 2 extra spmm passes)")
    ap.add_argument("--gat-layout", default=None,
                    choices=("h2", "wide", "split"),
                    help="GAT single-shot gather-table layout (see "
                    "segment_kernels.GAT_SINGLE_LAYOUT; measured: wide "
                    "87.2 ms, split 91.3 ms at 100k)")
    ap.add_argument("--gat-nophase", action="store_true",
                    help="GAT single-shot: drop the backward phase barrier "
                    "so the dsd pass can overlap the t2 gather DMA")
    ap.add_argument("--gat-h2-nobarrier", action="store_true",
                    help="GAT single-shot h2 layout: drop the "
                    "optimization_barrier pin on the gather table (A/B "
                    "whether the pin blocks VMEM staging)")
    ap.add_argument("--blocked-node-sd", action="store_true",
                    help="GAT blocked: use the precomputed sd node table "
                    "(round-1 design) instead of computing the dst score "
                    "half in-kernel from h2 - A/B for the products config")
    ap.add_argument("--stream-cache", action="store_true",
                    help="GAT single-shot: keep the forward's gathered "
                    "stream as a residual so the backward dsd pass skips "
                    "its re-gather. Measured NO-OP on this backend "
                    "(87.26 vs 87.15 ms at 100k - the re-gather is off "
                    "the critical path); kept for re-testing")
    ap.add_argument("--sampled", action="store_true",
                    help="neighbor-sampled GraphSAGE training throughput "
                    "(native C++ sampler + prefetch pipeline; the "
                    "reference's GraphSAGE/ClusterGCN scaling story)")
    ap.add_argument("--host-sampler", action="store_true",
                    help="--sampled: use the host C++/prefetch pipeline "
                    "(reference-style) instead of the default on-device "
                    "sampler (measured 7.4 s/step host vs device: the "
                    "~8 MB/batch block-structure transfer dominates on "
                    "the tunneled chip)")
    ap.add_argument("--batch-size", type=int, default=1024)
    ap.add_argument("--fanouts", default="15,10")
    ap.add_argument("--out", default=None,
                    help="also write the JSON result line to this file")
    args = ap.parse_args()
    _settle()
    if args.products:
        args.nodes, args.avg_degree = 2_450_000, 50
        if args.r_tile is None:
            # r4 sweep with aliased accumulation: 512 packs ~30% fewer slots
            # and measured 1211 ms vs 1396 (GCN; r3 best at 256 was 1840)
            args.r_tile = 512
    if args.sampled:
        return (bench_sampled(args) if args.host_sampler
                else bench_sampled_device(args))
    if args.r_tile is None:
        # single-shot default: 256 measured ~2% faster for GCN in two
        # back-to-back A/B pairs (23.94→23.44, 24.26→23.82 ms — less
        # 1024-slot quantisation); GAT regressed at 256 (77.9→82.4: 3
        # routing passes pay the taller-tile MXU cost), keep 128 there
        args.r_tile = 256 if args.model == "gcn" else 128

    import optax

    from cogdl_tpu.datasets.synthetic import powerlaw_graph
    from cogdl_tpu.models import build_model
    from cogdl_tpu.utils.evaluator import masked_cross_entropy

    from cogdl_tpu.data.graph import add_self_loops, sym_norm
    from cogdl_tpu.ops.pallas import _is_tpu, prepare_spmm

    if args.act_compress:
        from cogdl_tpu.ops import actnn

        actnn.set_compression(True)
    if args.no_block_accum:
        from cogdl_tpu.ops.pallas import segment_kernels

        segment_kernels.SPMM_BLOCK_ACCUM = False
    if args.stream_cache:
        from cogdl_tpu.ops.pallas import segment_kernels

        segment_kernels.GAT_STREAM_CACHE_BYTES = 4 << 30
    if args.blocked_node_sd:
        from cogdl_tpu.ops.pallas import segment_kernels

        segment_kernels.GAT_BLOCKED_NODE_SD = True
    if args.gat_layout:
        from cogdl_tpu.ops.pallas import segment_kernels

        segment_kernels.GAT_SINGLE_LAYOUT = args.gat_layout
    if args.gat_h2_nobarrier:
        from cogdl_tpu.ops.pallas import segment_kernels

        segment_kernels.GAT_H2_BARRIER = False
    if args.gat_nophase:
        from cogdl_tpu.ops.pallas import segment_kernels

        segment_kernels.GAT_PHASE_BARRIER = False

    graph_uncached = None
    if args.products or args.blocked:
        # OGB-scale: generate the graph AND build the kernel layouts on
        # device (the host link is too slow for multi-GB edge/layout arrays);
        # undirected ⇒ Aᵀ=A ⇒ backward reuses the forward layout, and the
        # blocked streaming driver keeps the message blocks within HBM.
        from cogdl_tpu.datasets.synthetic import powerlaw_graph_device
        from cogdl_tpu.ops.pallas.device_layout import prepare_spmm_device

        graph = powerlaw_graph_device(args.nodes, avg_degree=args.avg_degree,
                                      feat_dim=args.feat_dim,
                                      pad_multiple=args.r_tile)
        if _is_tpu():
            from cogdl_tpu.ops.pallas.device_layout import (
                BLOCK_CHUNKS, default_panel_rows)

            pr, pr_bw = args.panel_rows, args.panel_rows_bw
            if (args.model == "gat" and pr is None and pr_bw is None
                    and not args.uniform_panels):
                # per-direction sizing (r5): the four h2-gathering sweeps
                # read 128-lane rows (512 B) — 2x bigger panels than the
                # dsrc pass's 256-physical-lane [dagg|dden|sd] rows
                # (1024 B). Fewer (panel, tile) groups on the fw layout =
                # ~25% less slot padding at products scale.
                rt = args.r_tile or 512
                n_pad_l = ((args.nodes + rt - 1) // rt) * rt
                pr = default_panel_rows(n_pad_l, feat_bytes=512, r_tile=rt)
                pr_bw = default_panel_rows(n_pad_l, feat_bytes=1024,
                                           r_tile=rt)
            graph = prepare_spmm_device(graph, symmetric=True,
                                        with_orig=args.model == "gat",
                                        with_dropout=args.attn_drop > 0,
                                        gather_bf16=args.bf16_gather,
                                        panel_rows=pr,
                                        panel_rows_bw=pr_bw,
                                        block_chunks=(args.block_chunks
                                                      or BLOCK_CHUNKS),
                                        r_tile=args.r_tile)
            # the kernel path reads only the layout extras — free the raw
            # edge arrays (1.5 GB at products scale; HBM is the constraint)
            z = jnp.zeros(1, jnp.int32)
            graph = graph.replace(row=z, col=z,
                                  edge_weight=jnp.zeros(1, jnp.float32))
    else:
        relabel = [m for m in (args.reorder, args.reorder2) if m] or None
        graph = powerlaw_graph(args.nodes, avg_degree=args.avg_degree,
                               feat_dim=args.feat_dim, device_features=True,
                               relabel=relabel)
        graph = sym_norm(add_self_loops(graph))
        if _is_tpu():
            graph = prepare_spmm(graph, r_tile=args.r_tile)
    prop_cached = False
    if args.model == "gcn" and not args.no_prop_cache:
        # exact first-layer folding (dropout=0 here): P = ÂX and s = Â1 are
        # step-invariant, so layer 1 becomes PW + (s)bᵀ — no gather sweep in
        # either direction. ops.cache_propagation; the model verifies the
        # exactness conditions itself.
        from cogdl_tpu.ops import cache_propagation

        graph_uncached = graph
        graph = cache_propagation(graph)
        prop_cached = True
    kw = dict(in_features=args.feat_dim, out_features=graph.num_classes,
              hidden_size=args.hidden, dropout=0.0)
    if args.model == "gat":
        kw.update(nhead=8, hidden_size=args.hidden // 8,
                  attn_drop=args.attn_drop,
                  exact_scores=args.exact_scores)
    model = build_model(args.model, **kw)
    rng = jax.random.PRNGKey(0)
    # jit the init: params depend only on shapes, so XLA DCEs the whole
    # forward — eager init at products scale materialises every multi-GB
    # intermediate op-by-op and OOMs before training even starts
    variables = jax.jit(model.init, static_argnames="training")(
        rng, graph, graph.x, training=False)
    tx = optax.adam(1e-2)
    opt_state = tx.init(variables["params"])

    def train_step(params, opt_state, g):
        def loss_fn(p):
            if args.bf16:
                p = jax.tree.map(
                    lambda a: a.astype(jnp.bfloat16)
                    if a.dtype == jnp.float32 else a, p)
                g_ = g.replace(x=g.x.astype(jnp.bfloat16))
            else:
                g_ = g

            def fwd(p, xx):
                return model.apply({"params": p}, g_, xx, training=True,
                                   rngs={"dropout": rng})

            if args.products and args.remat:
                # trade 2 extra spmm passes for ~2.5 GB of activations
                fwd = jax.checkpoint(fwd)
            logits = fwd(p, g_.x)
            mask = g_.train_mask & g_.node_mask()
            return masked_cross_entropy(
                logits.astype(jnp.float32), g_.y, mask)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        grads = jax.tree.map(lambda a: a.astype(jnp.float32), grads)
        upd, opt_state2 = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, upd), opt_state2, loss

    @functools.partial(jax.jit, static_argnums=(3,))
    def run_steps(params, opt_state, g, n):
        def body(carry, _):
            p, o = carry
            p, o, loss = train_step(p, o, g)
            return (p, o), loss

        (params, opt_state), losses = jax.lax.scan(
            body, (params, opt_state), None, length=n)
        return params, opt_state, losses[-1]

    params = variables["params"]
    params, opt_state, loss = run_steps(params, opt_state, graph, args.warmup)
    float(loss)  # force completion

    dt = float("inf")
    for _ in range(max(args.repeats, 1)):
        t0 = time.perf_counter()
        params, opt_state, loss = run_steps(params, opt_state, graph,
                                            args.steps)
        float(loss)  # force completion
        dt = min(dt, time.perf_counter() - t0)

    edges_per_sec = graph.num_edges * args.steps / dt
    # context: the measured per-step floor is the XLA row-gather engine at
    # ~3 ns/row on VMEM-staged tables (scripts/microbench_gather*.py; the
    # in-kernel alternatives measured slower for random access) — a step
    # doing S edge-row sweeps cannot beat 1/(S*3ns) edges/s on this chip
    if args.model == "gcn":
        sweeps = 2 if prop_cached else 4
    elif args.model == "gat":
        sweeps = 3  # fwd gather + dsrc gather + (dsd re-gather unless cached)
        if args.stream_cache and not args.products:
            sweeps = 2
    else:
        sweeps = 4
    floor = 1e9 / (3.0 * sweeps)
    payload = {
        "metric": f"{args.model.upper()} train-step edges/sec (1 chip, powerlaw "
                  f"{args.nodes}n x{args.avg_degree}, F={args.feat_dim})",
        "value": round(edges_per_sec),
        "unit": "edges/sec",
        "vs_baseline": round(edges_per_sec / BASELINE_EDGES_PER_SEC, 4),
        "step_ms": round(1000 * dt / args.steps, 2),
        "device": str(jax.devices()[0]), "bf16": args.bf16,
        "blocked_layout": bool(args.products or args.blocked),
        "prop_cache": prop_cached,
        "gather_sweeps": sweeps,
        "vs_gather_floor": round(edges_per_sec / floor, 3),
    }
    if graph_uncached is not None:
        # honesty line: the prop cache only engages with zero input dropout,
        # so also report the representative-training (uncached) step time —
        # same params, cache-free program (VERDICT r2 "weak" item 2)
        params, opt_state, loss = run_steps(params, opt_state, graph_uncached,
                                            args.warmup)
        float(loss)
        dt2 = float("inf")
        for _ in range(max(args.repeats, 1)):
            t0 = time.perf_counter()
            params, opt_state, loss = run_steps(params, opt_state,
                                                graph_uncached, args.steps)
            float(loss)
            dt2 = min(dt2, time.perf_counter() - t0)
        payload["step_ms_no_cache"] = round(1000 * dt2 / args.steps, 2)
        payload["edges_per_sec_no_cache"] = round(
            graph.num_edges * args.steps / dt2)
    _emit(payload, args.out)


def bench_sampled_device(args):
    """Mini-batch neighbor-sampled training with the ON-DEVICE sampler
    (data/device_sampling.py): CSR + features stay resident in HBM, sampling
    traces into the train step, and the timed steps scan over an epoch's
    [n_batches, B] seed matrix inside ONE jit — a batch costs a 4 KB seed
    row instead of the host pipeline's ~8 MB block-structure transfer
    (which capped the r2 number at 7.4 s/step on the tunneled chip)."""
    import optax

    from cogdl_tpu.data.device_sampling import (
        DeviceNeighborSampler, plan_sizes, sample_blocks_device)
    from cogdl_tpu.data.graph import add_self_loops
    from cogdl_tpu.datasets.synthetic import powerlaw_graph
    from cogdl_tpu.models import build_model
    from cogdl_tpu.utils.evaluator import masked_cross_entropy

    if args.products:
        # OGB scale: the CSR + features generate straight on device (the
        # host link is too slow for a 124M-edge COO); the device sampler
        # only needs row_ptr/col + resident x/y/mask tables
        from cogdl_tpu.datasets.synthetic import powerlaw_graph_device

        graph = powerlaw_graph_device(args.nodes, avg_degree=args.avg_degree,
                                      feat_dim=args.feat_dim)
    else:
        graph = powerlaw_graph(args.nodes, avg_degree=args.avg_degree,
                               feat_dim=args.feat_dim, device_features=True)
        graph = add_self_loops(graph)
    fanouts = tuple(int(f) for f in args.fanouts.split(","))
    B = args.batch_size
    name = args.model if args.model in ("sage", "gat") else "sage"
    kw = dict(in_features=args.feat_dim, out_features=graph.num_classes,
              hidden_size=args.hidden, dropout=0.0)
    if name == "gat":  # blocks-consuming GAT (minibatch attention)
        kw.update(hidden_size=args.hidden // 8, nhead=8, attn_drop=0.0)
    model = build_model(name, **kw)
    sampler = DeviceNeighborSampler(graph, fanouts, batch_size=B)
    rows = [sampler.epoch_seeds()]
    while sum(r.shape[0] for r in rows) < args.warmup + args.steps:
        rows.append(sampler.epoch_seeds())  # span epochs if the split is small
    import numpy as np

    seeds_mat = jnp.asarray(np.concatenate(rows, axis=0))

    sizes = plan_sizes(B, fanouts)
    edges_per_batch = sum(sizes[k] * f for k, f in enumerate(fanouts))

    def init_blocks(seeds):
        return sample_blocks_device(graph, seeds, jax.random.PRNGKey(0),
                                    fanouts)[0]

    def init_fn(rng, seeds):
        blocks = init_blocks(seeds)
        x = jnp.take(blocks[0].extras["x_table"], blocks[0].extras["frame"],
                     axis=0, mode="clip")
        return model.init({"params": rng, "dropout": rng}, list(blocks), x,
                          training=False)

    variables = jax.jit(init_fn)(jax.random.PRNGKey(0), seeds_mat[0])
    params = variables["params"]
    tx = optax.adam(1e-2)
    opt_state = tx.init(params)

    @functools.partial(jax.jit, static_argnums=(4,))
    def run_steps(params, opt_state, g, seed_rows, n):
        def body(carry, seeds):
            p, o, k = carry
            k, sk, dk = jax.random.split(k, 3)

            def loss_fn(p):
                blocks, _ = sample_blocks_device(g, seeds, sk, fanouts)
                x = jnp.take(blocks[0].extras["x_table"],
                             blocks[0].extras["frame"], axis=0, mode="clip")
                logits = model.apply({"params": p}, list(blocks), x,
                                     training=True, rngs={"dropout": dk})
                ex = blocks[0].extras
                return masked_cross_entropy(logits[:B], ex["seed_y"],
                                            ex["seed_train_mask"])

            loss, grads = jax.value_and_grad(loss_fn)(p)
            upd, o = tx.update(grads, o, p)
            return (optax.apply_updates(p, upd), o, k), loss

        (params, opt_state, _), losses = jax.lax.scan(
            body, (params, opt_state, jax.random.PRNGKey(1)), seed_rows)
        return params, opt_state, losses[-1]

    warm_rows = seeds_mat[: args.warmup]
    params, opt_state, loss = run_steps(params, opt_state, graph, warm_rows,
                                        args.warmup)
    float(loss)

    timed_rows = seeds_mat[args.warmup: args.warmup + args.steps]
    dt = float("inf")
    for _ in range(max(args.repeats, 1)):
        t0 = time.perf_counter()
        params, opt_state, loss = run_steps(params, opt_state, graph,
                                            timed_rows, args.steps)
        float(loss)
        dt = min(dt, time.perf_counter() - t0)

    eps = edges_per_batch * args.steps / dt
    _emit({
        "metric": f"{name.upper()} sampled-train edge-slots/sec (1 chip, on-device "
                  f"sampler, powerlaw {args.nodes}n x{args.avg_degree}, "
                  f"fanouts {args.fanouts}, B={B})",
        "value": round(eps),
        "unit": "edges/sec",
        "vs_baseline": round(eps / BASELINE_EDGES_PER_SEC, 4),
        "step_ms": round(1000 * dt / args.steps, 2),
        "seeds_per_sec": round(B * args.steps / dt),
        "device": str(jax.devices()[0]),
        "note": "sampling + gathers + train step in one jitted scan; "
                "per-batch host traffic = one [B] int32 seed row",
    }, args.out)


def bench_sampled(args):
    """Mini-batch neighbor-sampled training: host C++/OpenMP sampler +
    background prefetch (device_put pipeline) feeding one jitted step —
    the TPU analog of the reference's GraphSAGE path (graphsage_dw +
    DataLoader workers). Metric: sampled edge slots aggregated per second
    (static block shapes; includes host sampling, transfer, and step)."""
    import optax

    from cogdl_tpu.datasets.synthetic import powerlaw_graph
    from cogdl_tpu.models import build_model
    from cogdl_tpu.wrappers import fetch_wrapper

    # features generated (and kept) on device; sampled batches carry only
    # the frame INDEX (~1 MB) instead of gathered feature rows — the
    # production layout (features never leave HBM), and essential on this
    # tunneled dev chip (a 134 MB/batch feature transfer measured 9 s/step)
    graph = powerlaw_graph(args.nodes, avg_degree=args.avg_degree,
                           feat_dim=args.feat_dim, device_features=True)
    fanouts = tuple(int(f) for f in args.fanouts.split(","))
    model = build_model("sage", in_features=args.feat_dim,
                        out_features=graph.num_classes,
                        hidden_size=args.hidden, dropout=0.0)
    wrapper = fetch_wrapper("neighbor_sampling")(
        model, None, fanouts=fanouts, batch_size=args.batch_size,
        device_features=True)
    g = wrapper.prepare_graph(graph)
    rng = jax.random.PRNGKey(0)
    variables = wrapper.init(rng, g)
    params = variables["params"]
    state = {k: v for k, v in variables.items() if k != "params"}
    tx = optax.adam(1e-2)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, batch):
        def loss_fn(p):
            loss, _ = wrapper.loss({"params": p, **state}, batch, rng)
            return loss

        loss, grads = jax.value_and_grad(loss_fn)(params)
        upd, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, upd), opt_state, loss

    # one iterator only — abandoning a Prefetcher mid-epoch parks its worker
    it = iter(wrapper.train_batches(g))
    first = next(it)
    edges_per_batch = sum(int(b.row.shape[0]) for b in first)
    params, opt_state, loss = step(params, opt_state, first)
    for _ in range(max(args.warmup - 1, 0)):
        batch = next(it, None)
        if batch is None:
            raise SystemExit("--sampled: epoch shorter than --warmup; "
                             "lower --batch-size or --warmup")
        params, opt_state, loss = step(params, opt_state, batch)
    float(loss)

    n = 0
    t0 = time.perf_counter()
    for batch in it:
        params, opt_state, loss = step(params, opt_state, batch)
        n += 1
        if n >= args.steps:
            break
    if n == 0:
        raise SystemExit("--sampled: no timed steps left in the epoch; "
                         "lower --batch-size/--warmup or raise --nodes")
    float(loss)  # force completion of the whole queued pipeline
    dt = time.perf_counter() - t0

    eps = edges_per_batch * n / dt
    _emit({
        "metric": f"SAGE sampled-train edge-slots/sec (1 chip, host sampler, powerlaw "
                  f"{args.nodes}n x{args.avg_degree}, fanouts {args.fanouts},"
                  f" B={args.batch_size})",
        "value": round(eps),
        "unit": "edges/sec",
        "vs_baseline": round(eps / BASELINE_EDGES_PER_SEC, 4),
        "step_ms": round(1000 * dt / max(n, 1), 2),
        "seeds_per_sec": round(args.batch_size * n / dt),
        "device": str(jax.devices()[0]),
        "note": "end-to-end incl. host->device transfer; on a tunneled "
                "dev chip the ~MB/s link dominates (features already "
                "stay resident - only block structure is shipped)",
    }, args.out)


if __name__ == "__main__":
    main()
