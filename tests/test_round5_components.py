"""Round-5 components: vmapped seed-parallel training (the TPU-native
replacement for the reference's mp.Pool variant farm,
reference cogdl/experiments.py:277-294)."""

import numpy as np
import pytest

from cogdl_tpu.experiments import experiment, train, train_seeds_vmapped


SEEDS = [0, 1, 2]


def test_vmap_seeds_matches_sequential():
    """Per-seed results from the single vmapped program equal sequential
    train() runs — identical PRNG chains, best-snapshot and patience
    semantics (trainer/vmap_seeds.py)."""
    res_v = train_seeds_vmapped("sbm", "gcn", SEEDS, epochs=25, patience=10)
    res_s = [train("sbm", "gcn", seed=s, epochs=25, patience=10)
             for s in SEEDS]
    assert len(res_v) == len(SEEDS)
    for rv, rs in zip(res_v, res_s):
        assert rv["best_epoch"] == rs["best_epoch"]
        for k in ("test_acc", "val_acc"):
            assert abs(rv[k] - rs[k]) < 1e-6, (k, rv[k], rs[k])


def test_vmap_seeds_early_stop_and_learning():
    """Patience engages per seed (loop exits before epochs) and every seed
    learns sbm well above chance."""
    res = train_seeds_vmapped("sbm", "gcn", [3, 4], epochs=300, patience=10,
                              eval_step=1)
    for r in res:
        assert r["test_acc"] > 0.9
        assert r["best_epoch"] < 299


def test_vmap_seeds_experiment_api(capsys):
    """experiment(..., vmap_seeds=True) returns the same shape of results
    table as the sequential grid."""
    results = experiment(dataset="sbm", model="gcn", seed=SEEDS,
                         vmap_seeds=True, epochs=20)
    runs = results[("sbm", "gcn")]
    assert len(runs) == len(SEEDS)
    assert all(r["test_acc"] > 0.9 for r in runs)
    assert "test_acc" in capsys.readouterr().out


def test_vmap_seeds_unsupported_wrapper_falls_back():
    """A wrapper needing per-epoch host work (sampled training) raises in
    train_seeds_vmapped and raw_experiment falls back to sequential."""
    with pytest.raises(ValueError, match="vmap_seeds"):
        train_seeds_vmapped("sbm", "graphsage", SEEDS, epochs=2,
                            wrapper="neighbor_sampling",
                            batch_size=32, fanouts=[3, 2])
    results = experiment(dataset="sbm", model="graphsage", seed=[0, 1],
                         vmap_seeds=True, epochs=2,
                         wrapper="neighbor_sampling",
                         batch_size=32, fanouts=[3, 2])
    assert len(results[("sbm", "graphsage")]) == 2


def test_vmap_seeds_export(tmp_path):
    """export_path under vmap_seeds exports the last seed's weights as a
    servable artifact."""
    path = str(tmp_path / "m.stablehlo")
    train_seeds_vmapped("sbm", "gcn", [0, 1], epochs=10, export_path=path)
    from cogdl_tpu.datasets import build_dataset
    from cogdl_tpu.serve import Predictor

    ds = build_dataset("sbm")
    from cogdl_tpu.data.graph import add_self_loops, sym_norm

    g = sym_norm(add_self_loops(ds.graph))
    pred = Predictor(path, g)
    labels = np.asarray(pred.predict())
    y = np.asarray(ds.graph.y)[: ds.graph.num_nodes]
    assert (labels == y).mean() > 0.9


# ---------------------------------------------------------------------------
# Trainer(activation_compression=True): the ActNN-analog as a usable flag
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("model", ["gcn", "gcnii", "graphsage"])
def test_activation_compression_trains_to_parity(model):
    """The compressed path (int8 dense residuals + bool relu masks) trains
    each GCN-family model to the same accuracy class as the exact path —
    quantisation noise enters only dw (ops/actnn.py)."""
    base = train("sbm", model, seed=0, epochs=40)
    comp = train("sbm", model, seed=0, epochs=40, activation_compression=True)
    assert comp["test_acc"] > 0.9
    assert abs(comp["test_acc"] - base["test_acc"]) < 0.05


def test_activation_compression_residual_is_int8():
    """Under the flag the backward residual of the layer dense really is the
    int8 tensor (checked in the jaxpr of the value_and_grad computation)."""
    import jax
    import jax.numpy as jnp

    from cogdl_tpu.datasets import build_dataset
    from cogdl_tpu.models import build_model
    from cogdl_tpu.ops import actnn
    from cogdl_tpu.wrappers import fetch_wrapper

    ds = build_dataset("sbm")
    mdl = build_model("gcn", in_features=ds.num_features,
                      out_features=ds.num_classes, hidden_size=32)
    w = fetch_wrapper("node_classification")(mdl, ds)
    g = w.prepare_graph(ds.graph)
    variables = w.init(jax.random.PRNGKey(0), g)

    def loss(params):
        return w.loss({"params": params}, g, jax.random.PRNGKey(1),
                      training=True)[0]

    prev = actnn.set_compression(True)
    try:
        jaxpr = jax.make_jaxpr(jax.grad(loss))(variables["params"])
    finally:
        actnn.set_compression(prev)
    assert "convert_element_type[new_dtype=int8" in str(jaxpr)
    # and without the flag there is no int8 anywhere
    jaxpr0 = jax.make_jaxpr(jax.grad(loss))(variables["params"])
    assert "int8" not in str(jaxpr0)


# ---------------------------------------------------------------------------
# vmapped CONFIG grids (seed × lr × weight_decay in one program)
# ---------------------------------------------------------------------------

def test_vmap_grid_matches_sequential():
    """Each (seed, lr, weight_decay) lane of the vmapped grid equals the
    sequential train() run with those hypers."""
    from cogdl_tpu.experiments import train_grid_vmapped

    configs = [
        {"seed": 0, "lr": 1e-2, "weight_decay": 5e-4},
        {"seed": 1, "lr": 3e-3, "weight_decay": 0.0},
        {"seed": 0, "lr": 1e-1, "weight_decay": 1e-3},
    ]
    res_g = train_grid_vmapped("sbm", "gcn", configs, epochs=25, patience=10)
    for c, rg in zip(configs, res_g):
        rs = train("sbm", "gcn", epochs=25, patience=10, **c)
        assert rg["best_epoch"] == rs["best_epoch"], c
        assert abs(rg["test_acc"] - rs["test_acc"]) < 1e-6, c


def test_vmap_grid_lanes_actually_differ():
    """Different lrs produce different trajectories (the per-lane
    hyperparams really take effect — not the shared default)."""
    from cogdl_tpu.experiments import train_grid_vmapped

    res = train_grid_vmapped(
        "sbm", "gcn",
        [{"seed": 0, "lr": 1e-2}, {"seed": 0, "lr": 1e-6}],
        epochs=15, patience=100, eval_step=15)
    # the 1e-6 lane has barely moved from init; the 1e-2 lane has learned
    assert res[0]["test_acc"] > 0.9
    assert res[1]["test_acc"] < res[0]["test_acc"] - 0.2


def test_vmap_grid_rejects_shape_hypers():
    from cogdl_tpu.experiments import train_grid_vmapped

    with pytest.raises(ValueError, match="sequentially"):
        train_grid_vmapped("sbm", "gcn",
                           [{"seed": 0, "hidden_size": 64}], epochs=2)


def test_automl_vmapped_startup():
    """When the search space varies only optimizer hypers, AutoML's
    random-startup trials train as ONE vmapped grid — sequential train()
    runs only for the TPE refinement trials."""
    import cogdl_tpu.automl as automl_mod
    import cogdl_tpu.experiments as exp_mod

    calls = {"train": 0, "grid": 0}
    orig_train, orig_grid = exp_mod.train, exp_mod.train_grid_vmapped

    def count_train(*a, **k):
        calls["train"] += 1
        return orig_train(*a, **k)

    def count_grid(*a, **k):
        calls["grid"] += 1
        return orig_grid(*a, **k)

    exp_mod.train = count_train
    exp_mod.train_grid_vmapped = count_grid
    try:
        out = automl_mod.AutoML(
            "sbm", "gcn", seeds=[0, 1], n_trials=6, backend="builtin",
            search_space={"lr": ("loguniform", 1e-3, 1e-1),
                          "weight_decay": ("loguniform", 1e-6, 1e-3)},
            epochs=15).run()
    finally:
        exp_mod.train = orig_train
        exp_mod.train_grid_vmapped = orig_grid
    assert calls["grid"] == 1                       # one batched startup
    # 6 trials, 4 startup -> 2 TPE trials x 2 seeds sequential
    assert calls["train"] == 2 * 2
    assert out["best_value"] > 0.8
    assert set(out["best_params"]) == {"lr", "weight_decay"}
