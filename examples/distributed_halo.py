"""Explicit shard_map halo-exchange training on an 8-device mesh.

    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python examples/distributed_halo.py
"""

import os
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

# honor JAX_PLATFORMS=cpu even where a sitecustomize pre-imports jax with a
# different platform (env alone is too late there; jax.config still works)
if os.environ.get("JAX_PLATFORMS") == "cpu":
    import jax

    jax.config.update("jax_platforms", "cpu")

import jax
import jax.numpy as jnp
import optax

from cogdl_tpu.data.graph import add_self_loops, sym_norm
from cogdl_tpu.datasets.synthetic import sbm_graph
from cogdl_tpu.parallel import make_mesh, replicate
from cogdl_tpu.parallel.halo import (
    device_put_parts, make_halo_train_step, partition_graph)

n = min(8, len(jax.devices()))
mesh = make_mesh(n)
g = sym_norm(add_self_loops(sbm_graph(num_nodes=1024, seed=0)))
parts = partition_graph(g, n)
F, H, C = g.num_features, 64, g.num_classes
k1, k2 = jax.random.split(jax.random.PRNGKey(0))
params = {"w1": jax.random.normal(k1, (F, H)) * 0.1,
          "w2": jax.random.normal(k2, (H, C)) * 0.1}


def model_apply(p, spmm_fn, x):
    return spmm_fn(jax.nn.relu(spmm_fn(x @ p["w1"])) @ p["w2"])


tx = optax.adam(1e-2)
step = make_halo_train_step(mesh, parts, model_apply, tx, C, exchange="ring")
dv = device_put_parts(mesh, parts)
params = replicate(mesh, params)
opt = replicate(mesh, tx.init(params))
with mesh:
    for epoch in range(30):
        params, opt, loss = step(params, opt, dv["x"], dv["y"],
                                 dv["train_mask"], dv["node_mask"],
                                 dv["row_local"], dv["col"], dv["w"])
        if epoch % 10 == 0:
            print(f"epoch {epoch}: loss={float(jnp.mean(loss)):.4f}")
