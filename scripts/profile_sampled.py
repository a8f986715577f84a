"""Per-op profile of the on-device-sampled train step (the bench --sampled
program): sampling gathers + frame feature gather + SAGE fwd/bwd + Adam in
one scanned program. Reuses profile_step's xplane parser.

    python scripts/profile_sampled.py [--nodes 100000] [--batch-size 1024]
"""

import argparse
import functools
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp

from profile_step import parse_xplane  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="sage")
    ap.add_argument("--nodes", type=int, default=100_000)
    ap.add_argument("--avg-degree", type=int, default=30)
    ap.add_argument("--feat-dim", type=int, default=100)
    ap.add_argument("--hidden", type=int, default=128)
    ap.add_argument("--batch-size", type=int, default=1024)
    ap.add_argument("--fanouts", default="15,10")
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--logdir", default="/tmp/jaxprof_sampled")
    ap.add_argument("--top", type=int, default=25)
    args = ap.parse_args()

    if jax.devices()[0].platform not in ("cpu",):
        time.sleep(30)
        print("post-attach settle done")

    import optax

    from cogdl_tpu.data.device_sampling import (
        DeviceNeighborSampler, sample_blocks_device)
    from cogdl_tpu.data.graph import add_self_loops
    from cogdl_tpu.datasets.synthetic import powerlaw_graph
    from cogdl_tpu.models import build_model
    from cogdl_tpu.utils.evaluator import masked_cross_entropy

    graph = add_self_loops(powerlaw_graph(
        args.nodes, avg_degree=args.avg_degree, feat_dim=args.feat_dim,
        device_features=True))
    fanouts = tuple(int(f) for f in args.fanouts.split(","))
    B = args.batch_size
    kw = dict(in_features=args.feat_dim, out_features=graph.num_classes,
              hidden_size=args.hidden, dropout=0.0)
    if args.model == "gat":
        # attn_drop=0 matches bench_sampled_device's benched program
        kw.update(nhead=8, hidden_size=args.hidden // 8, attn_drop=0.0)
    model = build_model(args.model, **kw)
    sampler = DeviceNeighborSampler(graph, fanouts, batch_size=B)
    seeds = jnp.asarray(sampler.epoch_seeds()[0])

    def init_fn(rng):
        blocks, _ = sample_blocks_device(graph, seeds, rng, fanouts)
        x = jnp.take(blocks[0].extras["x_table"], blocks[0].extras["frame"],
                     axis=0, mode="clip")
        return model.init({"params": rng, "dropout": rng}, list(blocks), x,
                          training=False)

    variables = jax.jit(init_fn)(jax.random.PRNGKey(0))
    params = variables["params"]
    tx = optax.adam(1e-2)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, g, seeds, key):
        def loss_fn(p):
            blocks, _ = sample_blocks_device(g, seeds, key, fanouts)
            x = jnp.take(blocks[0].extras["x_table"],
                         blocks[0].extras["frame"], axis=0, mode="clip")
            logits = model.apply({"params": p}, list(blocks), x,
                                 training=True, rngs={"dropout": key})
            ex = blocks[0].extras
            return masked_cross_entropy(logits[:B], ex["seed_y"],
                                        ex["seed_train_mask"])

        loss, grads = jax.value_and_grad(loss_fn)(params)
        upd, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, upd), opt_state, loss

    params, opt_state, loss = step(params, opt_state, graph, seeds,
                                   jax.random.PRNGKey(1))
    print("compiled, loss:", float(loss))

    jax.profiler.start_trace(args.logdir)
    for i in range(args.steps):
        params, opt_state, loss = step(params, opt_state, graph, seeds,
                                       jax.random.PRNGKey(2 + i))
    print("profiled loss:", float(loss))
    jax.profiler.stop_trace()
    parse_xplane(args.logdir, args.top)


if __name__ == "__main__":
    main()
