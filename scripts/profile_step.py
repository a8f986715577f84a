"""Profile one jitted train step on the TPU and print the top device ops.

Usage:  python scripts/profile_step.py --model gat --nodes 100000 [--steps 3]

Captures a jax.profiler trace, then parses the xplane protobuf
(tensorflow.tsl.profiler.protobuf.xplane_pb2 — ship with jax) with the pure-
python protobuf implementation and aggregates device-op durations. This is the
observability workflow CLAUDE.md documents for kernel optimisation.
"""

from __future__ import annotations

import argparse
import glob
import os
import sys

os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_xplane(logdir: str, top: int = 30):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = glob.glob(os.path.join(logdir, "**", "*.xplane.pb"),
                      recursive=True)
    if not paths:
        print("no xplane found under", logdir)
        return
    xs = xplane_pb2.XSpace()
    with open(sorted(paths)[-1], "rb") as f:
        xs.ParseFromString(f.read())
    agg = {}
    for plane in xs.planes:
        if "TPU" not in plane.name and "/device" not in plane.name.lower():
            continue
        stats_meta = {k: v.name for k, v in plane.stat_metadata.items()}
        ev_meta = {k: v.name for k, v in plane.event_metadata.items()}
        for line in plane.lines:
            lname = line.name.lower()
            if "step" in lname and "xla" not in lname:
                continue
            for ev in line.events:
                name = ev_meta.get(ev.metadata_id, str(ev.metadata_id))
                dur = ev.duration_ps / 1e9  # ms
                key = (plane.name, line.name, name)
                agg[key] = (agg.get(key, (0.0, 0))[0] + dur,
                            agg.get(key, (0.0, 0))[1] + 1)
    rows = sorted(agg.items(), key=lambda kv: -kv[1][0])[:top]
    for (plane, line, name), (ms, n) in rows:
        print(f"{ms:10.3f} ms  x{n:<5d} [{line[:24]:24s}] {name[:110]}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="gcn")
    ap.add_argument("--nodes", type=int, default=100_000)
    ap.add_argument("--avg-degree", type=int, default=30)
    ap.add_argument("--feat-dim", type=int, default=100)
    ap.add_argument("--hidden", type=int, default=128)
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--prop-cache", action="store_true",
                    help="apply ops.cache_propagation (the bench's default "
                    "GCN config) so the profile matches bench.py")
    ap.add_argument("--r-tile", type=int, default=256)
    ap.add_argument("--device-graph", action="store_true",
                    help="use the device-side generator + device layout "
                    "build (the --products path) at the given --nodes")
    ap.add_argument("--logdir", default="/tmp/jaxprof")
    ap.add_argument("--parse-only", action="store_true")
    ap.add_argument("--top", type=int, default=30)
    args = ap.parse_args()

    if args.parse_only:
        parse_xplane(args.logdir, args.top)
        return

    import time as _time

    import jax
    import jax.numpy as jnp

    # settle after backend attach (relay deadlock — CLAUDE.md)
    if jax.devices()[0].platform != "cpu":
        _time.sleep(30)
        print("post-attach settle done", flush=True)
    import optax

    from cogdl_tpu.data.graph import add_self_loops, sym_norm
    from cogdl_tpu.datasets.synthetic import powerlaw_graph
    from cogdl_tpu.models import build_model
    from cogdl_tpu.ops.pallas import _is_tpu, prepare_spmm
    from cogdl_tpu.utils.evaluator import masked_cross_entropy

    if args.device_graph:
        from cogdl_tpu.datasets.synthetic import powerlaw_graph_device
        from cogdl_tpu.ops.pallas.device_layout import prepare_spmm_device

        graph = powerlaw_graph_device(args.nodes, avg_degree=args.avg_degree,
                                      feat_dim=args.feat_dim,
                                      pad_multiple=args.r_tile)
        if _is_tpu():
            kwp = {}
            if args.model == "gat":
                # r5 defaults: per-direction panels + 512-chunk blocks
                from cogdl_tpu.ops.pallas.device_layout import (
                    default_panel_rows)
                n_pad_l = ((args.nodes + args.r_tile - 1)
                           // args.r_tile) * args.r_tile
                kwp = dict(
                    panel_rows=default_panel_rows(n_pad_l, feat_bytes=512,
                                                  r_tile=args.r_tile),
                    panel_rows_bw=default_panel_rows(n_pad_l,
                                                     feat_bytes=1024,
                                                     r_tile=args.r_tile),
                    block_chunks=512)
            graph = prepare_spmm_device(graph, symmetric=True,
                                        with_orig=args.model == "gat",
                                        r_tile=args.r_tile, **kwp)
            import jax.numpy as _jnp
            z = _jnp.zeros(1, _jnp.int32)
            graph = graph.replace(row=z, col=z,
                                  edge_weight=_jnp.zeros(1, _jnp.float32))
    else:
        graph = powerlaw_graph(args.nodes, avg_degree=args.avg_degree,
                               feat_dim=args.feat_dim, device_features=True)
        graph = sym_norm(add_self_loops(graph))
        if _is_tpu():
            graph = prepare_spmm(graph)
    if args.prop_cache and args.model == "gcn":
        from cogdl_tpu.ops import cache_propagation

        graph = cache_propagation(graph)
    kw = dict(in_features=args.feat_dim, out_features=graph.num_classes,
              hidden_size=args.hidden, dropout=0.0)
    if args.model == "gat":
        kw.update(nhead=8, hidden_size=args.hidden // 8, attn_drop=0.0)
    model = build_model(args.model, **kw)
    rng = jax.random.PRNGKey(0)
    # jit the init — eager init at products scale materialises every
    # multi-GB intermediate and OOMs (CLAUDE.md)
    variables = jax.jit(model.init, static_argnames="training")(
        rng, graph, graph.x, training=False)
    tx = optax.adam(1e-2)
    opt_state = tx.init(variables["params"])

    @jax.jit
    def step(params, opt_state, g):
        def loss_fn(p):
            logits = model.apply({"params": p}, g, g.x, training=True,
                                 rngs={"dropout": rng})
            mask = g.train_mask & g.node_mask()
            return masked_cross_entropy(logits, g.y, mask)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        upd, opt_state2 = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, upd), opt_state2, loss

    params = variables["params"]
    params, opt_state, loss = step(params, opt_state, graph)  # compile
    print("compiled, loss:", float(loss))

    with jax.profiler.trace(args.logdir):
        for _ in range(args.steps):
            params, opt_state, loss = step(params, opt_state, graph)
        print("profiled loss:", float(loss))

    parse_xplane(args.logdir, args.top)


if __name__ == "__main__":
    main()
