"""Feature-sharded sampled training (the papers100M-class path).

The feature table AND the CSR edge list live row/edge-sharded across the
mesh — no device holds a replica — and each step's frontier rows move with
one all_gather(idx) + psum_scatter. Memory math at ogbn-papers100M scale
(111M x 128 f32 = 57 GB features, 1.6B edges = 6.4 GB int32): on 8 chips a
device holds 7.1 GB of features + 0.8 GB of edges.

    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python examples/feature_sharded_training.py
"""

import os
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

if os.environ.get("JAX_PLATFORMS") == "cpu":
    import jax

    jax.config.update("jax_platforms", "cpu")

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import PartitionSpec as P

from cogdl_tpu.data.graph import add_self_loops
from cogdl_tpu.datasets.synthetic import powerlaw_graph
from cogdl_tpu.models import build_model
from cogdl_tpu.parallel import (make_mesh, sample_blocks_device_sharded,
                                shard_rows, sharded_frame_features)
from cogdl_tpu.utils.evaluator import masked_cross_entropy

AXIS = "graph"
NDEV = min(8, len(jax.devices()))
B, FANOUTS = 32, (5, 5)

g = add_self_loops(powerlaw_graph(20_000, avg_degree=12, feat_dim=64))
mesh = make_mesh(NDEV)

# shard the big tables; keep row_ptr / labels replicated (they are small)
xs = shard_rows(g.x, mesh)
cols = shard_rows(g.col, mesh)
print(f"features: {xs.shape} over {len(xs.addressable_shards)} shards of "
      f"{xs.addressable_shards[0].data.shape} — no replica anywhere")

meta = {"num_nodes": g.num_nodes, "n_pad": g.n_pad,
        "e_tab": int(g.col.shape[0]), "num_classes": g.num_classes}
model = build_model("sage", in_features=g.num_features,
                    out_features=g.num_classes, hidden_size=64, dropout=0.0)

# init from one replicated sample
from cogdl_tpu.data.device_sampling import sample_blocks_device

blocks0, _ = sample_blocks_device(g, jnp.arange(B, dtype=jnp.int32),
                                  jax.random.PRNGKey(0), FANOUTS)
x0 = jnp.take(blocks0[0].extras["x_table"], blocks0[0].extras["frame"],
              axis=0, mode="clip")
variables = model.init(jax.random.PRNGKey(1), list(blocks0), x0,
                       training=False)
tx = optax.adam(1e-2)
opt_state = tx.init(variables["params"])


def local_loss(params, x_local, col_local, row_ptr, y, seeds, step):
    me = jax.lax.axis_index(AXIS)
    key = jax.random.fold_in(jax.random.fold_in(jax.random.PRNGKey(2), me),
                             step)
    blocks, frame = sample_blocks_device_sharded(
        row_ptr, col_local, meta, seeds, key, FANOUTS, dp=True)
    x = sharded_frame_features(x_local, frame, dp=True)
    logits = model.apply({"params": params}, list(blocks), x, training=False)
    yb = jnp.take(y, frame[:B], mode="clip")
    return jax.lax.pmean(
        masked_cross_entropy(logits[:B], yb, jnp.ones(B, bool)), AXIS)


def local_value_and_grad(params, x_local, col_local, row_ptr, y, seeds,
                         step):
    loss, grads = jax.value_and_grad(local_loss)(
        params, x_local, col_local, row_ptr, y, seeds, step)
    # grads of the pmean'd loss are each device's FULL local gradient
    # (psum's transpose replays the replicated cotangent to every device
    # un-scaled) — pmean them so every replica applies the same averaged
    # gradient (without this the "replicated" params silently diverge)
    return loss, jax.lax.pmean(grads, AXIS)


@jax.jit
def train_step(params, opt_state, xs, cols, row_ptr, y, seeds, step):
    loss, grads = jax.shard_map(
        local_value_and_grad, mesh=mesh,
        in_specs=(P(), P(AXIS), P(AXIS), P(), P(), P(AXIS), P()),
        out_specs=(P(), P()), check_vma=False)(
        params, xs, cols, row_ptr, y, seeds, step)
    upd, opt_state = tx.update(grads, opt_state, params)
    return optax.apply_updates(params, upd), opt_state, loss


train_ids = np.nonzero(np.asarray(g.train_mask)[: g.num_nodes])[0]
rng = np.random.default_rng(0)
params = variables["params"]
for step in range(20):
    seeds = jnp.asarray(rng.choice(train_ids, NDEV * B).astype(np.int32))
    params, opt_state, loss = train_step(
        params, opt_state, xs, cols, g.row_ptr, g.y, seeds,
        jnp.int32(step))
    if step % 5 == 0:
        print(f"step {step}: loss {float(loss):.4f}")
print("final loss:", float(loss))
