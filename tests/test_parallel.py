"""Distributed paths on the 8-virtual-device CPU mesh: GSPMD sharded graph,
explicit shard_map halo SpMM (all-gather and ring), and a full distributed
train step. The reference has ZERO distributed tests (SURVEY.md §4) — this is
the deterministic multi-device coverage TPU/JAX makes cheap."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from cogdl_tpu import ops
from cogdl_tpu.data.graph import add_self_loops, sym_norm
from cogdl_tpu.datasets.synthetic import sbm_graph
from cogdl_tpu.parallel import make_mesh, replicate, shard_graph
from cogdl_tpu.parallel.halo import (
    AXIS,
    halo_spmm_allgather,
    halo_spmm_ring,
    partition_graph,
)
from jax import shard_map
from jax.sharding import PartitionSpec as P

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 virtual devices")


@pytest.fixture(scope="module")
def g():
    return sym_norm(add_self_loops(sbm_graph(num_nodes=512, seed=0)))


def test_gspmd_sharded_spmm_matches(g):
    mesh = make_mesh(8)
    gs = shard_graph(g, mesh)
    ref = np.asarray(ops.spmm(g, g.x))
    with mesh:
        out = jax.jit(lambda gg, xx: ops.spmm(gg, xx))(gs, gs.x)
    np.testing.assert_allclose(np.asarray(out)[: g.n_pad], ref, rtol=1e-4,
                               atol=1e-5)


@pytest.mark.parametrize("fn", [halo_spmm_allgather, halo_spmm_ring])
def test_halo_spmm_matches_single_device(g, fn):
    mesh = make_mesh(8)
    parts = partition_graph(g, 8)
    Nl = parts["n_local"]
    x = jnp.asarray(parts["x"].reshape(-1, parts["x"].shape[-1]))
    row_l = jnp.asarray(parts["row_local"].reshape(-1))
    col = jnp.asarray(parts["col"].reshape(-1))
    w = jnp.asarray(parts["w"].reshape(-1))

    sharded = shard_map(
        lambda xx, rl, cg, ww: fn(xx, rl, cg, ww),
        mesh=mesh,
        in_specs=(P(AXIS), P(AXIS), P(AXIS), P(AXIS)),
        out_specs=P(AXIS),
    )
    with mesh:
        out = jax.jit(sharded)(x, row_l, col, w)
    ref = np.asarray(ops.spmm(g, g.x))
    got = np.asarray(out)[: g.n_pad]
    np.testing.assert_allclose(got[: g.num_nodes], ref[: g.num_nodes],
                               rtol=1e-4, atol=1e-4)


def test_halo_kernel_tier_matches_single_device(g):
    """Pallas kernel-tier local aggregation inside shard_map (interpret on
    CPU): all-gather + sorted-segment MXU kernel == single-device spmm."""
    from cogdl_tpu.parallel.halo import (
        halo_spmm_allgather_kernel,
        prepare_shard_layouts,
    )

    mesh = make_mesh(8)
    parts = prepare_shard_layouts(partition_graph(g, 8))
    x = jnp.asarray(parts["x"].reshape(-1, parts["x"].shape[-1]))
    lay = {k: jnp.asarray(parts[k].reshape((-1,) + parts[k].shape[2:]))
           for k in ("lay_col", "lay_w", "lay_row", "lay_ct")}
    n_local_pad = parts["n_local_pad"]

    sharded = shard_map(
        functools.partial(halo_spmm_allgather_kernel,
                          n_local_pad=n_local_pad),
        mesh=mesh,
        in_specs=(P(AXIS),) * 5,
        out_specs=P(AXIS),
        check_vma=False,  # pallas_call carries no vma annotation
    )
    with mesh:
        out = jax.jit(sharded)(x, lay["lay_col"], lay["lay_w"],
                               lay["lay_row"], lay["lay_ct"])
    ref = np.asarray(ops.spmm(g, g.x))
    got = np.asarray(out).reshape(8, -1, g.x.shape[-1])
    got = got[:, : parts["n_local"]].reshape(-1, g.x.shape[-1])
    np.testing.assert_allclose(got[: g.num_nodes], ref[: g.num_nodes],
                               rtol=1e-4, atol=1e-4)


def test_shard_graph_drops_pallas_layouts(g):
    from cogdl_tpu.ops.pallas import prepare_spmm

    mesh = make_mesh(8)
    gp = prepare_spmm(g)
    assert "spmm_fw_col" in gp.extras
    gs = shard_graph(gp, mesh)
    assert not gs.extras or "spmm_fw_col" not in gs.extras


def test_distributed_train_step_decreases_loss(g):
    from cogdl_tpu.parallel.halo import device_put_parts, make_halo_train_step

    mesh = make_mesh(8)
    parts = partition_graph(g, 8)
    num_classes = g.num_classes
    F = g.num_features
    H = 32
    key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    params = {
        "w1": jax.random.normal(k1, (F, H)) * 0.1,
        "w2": jax.random.normal(k2, (H, num_classes)) * 0.1,
    }

    def model_apply(p, spmm_fn, x):
        h = spmm_fn(x @ p["w1"])
        h = jax.nn.relu(h)
        return spmm_fn(h @ p["w2"])

    tx = optax.adam(1e-2)
    step = make_halo_train_step(mesh, parts, model_apply, tx, num_classes,
                                exchange="ring")
    dv = device_put_parts(mesh, parts)
    params = replicate(mesh, params)
    opt_state = replicate(mesh, tx.init(params))
    losses = []
    with mesh:
        for _ in range(8):
            params, opt_state, loss = step(
                params, opt_state, dv["x"], dv["y"], dv["train_mask"],
                dv["node_mask"], dv["row_local"], dv["col"], dv["w"])
            losses.append(float(jnp.mean(loss)))
    assert losses[-1] < losses[0] * 0.9, losses


def test_expert_parallel_moe_step(g):
    """MoE-GCN with expert-major weights sharded over the mesh — the
    TPU-native FastMoE/EP story (reference models/nn/moe_gcn.py wraps
    FastMoE's NCCL experts; here GSPMD partitions the expert-batched
    einsums and inserts the psum)."""
    from cogdl_tpu.models import build_model
    from cogdl_tpu.parallel import shard_expert_params
    from cogdl_tpu.utils.evaluator import masked_cross_entropy

    mesh = make_mesh(8)
    n_exp = 16
    model = build_model("moe_gcn", in_features=g.num_features,
                        out_features=g.num_classes, hidden_size=32,
                        num_experts=n_exp, dropout=0.0)
    variables = model.init(jax.random.PRNGKey(0), g, g.x, training=False)
    variables = shard_expert_params(mesh, variables, n_exp)
    assert "graph" in str(variables["params"]["moe0"]["w1"].sharding.spec)
    tx = optax.adam(1e-2)
    opt_state = tx.init(variables["params"])

    @jax.jit
    def step(variables, opt_state):
        def loss_fn(params):
            logits = model.apply({**variables, "params": params}, g, g.x,
                                 training=False)
            return masked_cross_entropy(logits, g.y,
                                        g.train_mask & g.node_mask())

        loss, grads = jax.value_and_grad(loss_fn)(variables["params"])
        upd, opt_state = tx.update(grads, opt_state, variables["params"])
        return ({**variables,
                 "params": optax.apply_updates(variables["params"], upd)},
                opt_state, loss)

    losses = []
    with mesh:
        for _ in range(6):
            variables, opt_state, loss = step(variables, opt_state)
            losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.9, losses


# ---------------------------------------------------------------------------
# Boundary-only halo exchange (round 2) + distributed wrapper via experiment()
# ---------------------------------------------------------------------------

def test_halo_partition_spmm_matches_single_device(g):
    """Sharded spmm with boundary-only all_to_all == single-device spmm."""
    from cogdl_tpu.parallel.halo import partition_graph_halo

    stacked = partition_graph_halo(g, 8)
    ref = np.asarray(ops.spmm(g, g.x))[: g.num_nodes]
    mesh = make_mesh(8)

    def local(gs):
        gl = jax.tree.map(lambda a: a[0], gs)
        return ops.spmm(gl, gl.x)[None]

    out = shard_map(local, mesh=mesh, in_specs=(P(AXIS),),
                    out_specs=P(AXIS), check_vma=False)(stacked)
    Nl = stacked.meta_get("halo_nl")
    shard_rows = np.asarray(out)[:, :Nl].reshape(-1, g.x.shape[1])
    # un-permute via the partition's node map (BFS relabels nodes)
    nodes = np.asarray(stacked.extras["halo_nodes"]).reshape(-1)
    got = np.zeros((g.num_nodes, g.x.shape[1]), np.float32)
    got[nodes[nodes >= 0]] = shard_rows[nodes >= 0]
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


def test_halo_comm_volume_below_allgather(g):
    """The point of boundary exchange: exact halo rows < all-gather rows."""
    from cogdl_tpu.parallel.halo import halo_comm_volume, partition_graph_halo

    vol = halo_comm_volume(partition_graph_halo(g, 8))
    assert vol["halo_rows_exact"] < vol["allgather_rows"], vol


@pytest.mark.parametrize("model", ["gcn", "gat"])
def test_distributed_wrapper_via_experiment(model):
    """experiment()-reachable distributed training, GCN and GAT (the GAT
    path distributes edge-softmax: scores gather halo score_src rows)."""
    from cogdl_tpu.experiments import train

    res = train("sbm", model, wrapper="distributed", n_devices=8,
                epochs=25, eval_every=25, patience=30, dropout=0.0,
                hidden_size=32, seed=0)
    assert res["test_acc"] > 0.8, res


def test_distributed_parity_with_single_device():
    """Same model/seed: distributed loss after k steps ≈ single-device loss
    (identical math up to float reassociation)."""
    import optax

    from cogdl_tpu.wrappers import fetch_wrapper
    from cogdl_tpu.models import build_model

    g0 = sbm_graph(num_nodes=400, seed=1)
    model = build_model("gcn", in_features=g0.num_features,
                        out_features=4, hidden_size=16, dropout=0.0)
    w = fetch_wrapper("distributed")(model, None, n_devices=8)
    gs = w.prepare_graph(g0)
    rng = jax.random.PRNGKey(0)
    variables = w.init(rng, gs)

    # single-device reference loss with the same params
    gref = sym_norm(add_self_loops(g0))
    from cogdl_tpu.utils.evaluator import masked_cross_entropy

    logits = model.apply(variables, gref, gref.x, training=False)
    ref_loss = float(masked_cross_entropy(
        logits, gref.y, gref.train_mask & gref.node_mask()))
    dist_loss = float(w.loss(variables, gs, rng, training=False)[0])
    assert abs(ref_loss - dist_loss) < 1e-3, (ref_loss, dist_loss)


# ---------------------------------------------------------------------------
# Multi-host scaffolding (simulated: hosts folded over virtual devices)
# ---------------------------------------------------------------------------

def test_hybrid_mesh_simulated_dcn_ici(g):
    """2 emulated hosts × 4 ICI chips: data-parallel gradient psum over the
    DCN axis composes with graph sharding over the ICI axis."""
    from cogdl_tpu.parallel import initialize_distributed, make_hybrid_mesh

    assert initialize_distributed() == 0   # single-process no-op
    mesh = make_hybrid_mesh(ici_shape=(4,))
    assert mesh.shape == {"data": 2, "graph": 4}

    x = jnp.arange(16.0).reshape(8, 2)

    def f(xl):
        s = jax.lax.psum(jnp.sum(xl), "graph")     # ICI collective
        return jax.lax.pmean(s, "data")[None]      # DCN collective

    out = shard_map(
        f, mesh=mesh, in_specs=(P("data", None),), out_specs=P("data"))(x)
    # slice sums 28/92, x replicated over graph (x4), pmean over data: 240
    np.testing.assert_allclose(np.asarray(out), [240.0, 240.0])


def test_hybrid_mesh_2d_ici(g):
    from cogdl_tpu.parallel import make_hybrid_mesh

    mesh = make_hybrid_mesh(ici_axes=("graph", "model"), ici_shape=(2, 2))
    assert mesh.shape == {"data": 2, "graph": 2, "model": 2}
