"""Task-level smoke tests — the reference's tests/tasks pattern: run the full
experiment() stack with shrunk budgets on small synthetic datasets and assert
sane metric ranges (reference tests/tasks/test_node_classification.py:46-57).
"""

import numpy as np
import pytest

from cogdl_tpu import experiment
from cogdl_tpu.experiments import train

SBM_KW = dict(epochs=20, patience=30)


NODE_MODELS = ["gcn", "gat", "graphsage", "sgc", "appnp", "gcnii", "mixhop",
               "mlp", "sign", "grand"]


@pytest.mark.parametrize("model", NODE_MODELS)
def test_node_classification(model):
    res = train("sbm", model, seed=0, **SBM_KW)
    assert 0.0 <= res["test_acc"] <= 1.0
    assert res["test_acc"] > 0.5  # SBM stand-in is easily learnable


def test_gin_graph_classification():
    res = train("random-graphs", "gin", seed=0, epochs=15, batch_size=16)
    assert 0.0 <= res["test_acc"] <= 1.0


def test_dgi_self_supervised():
    res = train("sbm", "dgi", seed=0, epochs=10, patience=10, hidden_size=64,
                eval_step=5)
    assert res["test_acc"] > 0.5


def test_grace_self_supervised():
    res = train("sbm", "grace", seed=0, epochs=8, patience=10, hidden_size=32,
                proj_size=32, eval_step=4)
    assert res["test_acc"] > 0.5


def test_gae_clustering():
    res = train("sbm", "gae", seed=0, epochs=10, patience=10, eval_step=5)
    assert 0.0 <= res["test_nmi"] <= 1.0


def test_gcn_link_prediction():
    res = train("sbm", "gcn", wrapper="link_prediction", seed=0, epochs=15,
                patience=20, eval_step=5)
    assert res["test_auc"] > 0.6


def test_experiment_grid_and_table(capsys):
    results = experiment(dataset="sbm", model="gcn", seed=[0, 1], epochs=5)
    ((_, runs),) = results.items()
    assert len(runs) == 2
    out = capsys.readouterr().out
    assert "test_acc" in out


def test_experiment_builds_each_dataset_once(monkeypatch):
    """raw_experiment resolves each named dataset ONCE and shares it across
    the model × seed grid (re-parsing per seed wastes minutes at OGB scale)."""
    import cogdl_tpu.experiments as ex

    calls = []
    real = ex.build_dataset

    def counting(name, **kw):
        calls.append(name)
        return real(name, **kw)

    monkeypatch.setattr(ex, "build_dataset", counting)
    ex.raw_experiment("sbm", "gcn", seeds=(0, 1, 2), epochs=2)
    assert calls == ["sbm"]


def test_best_config_overlay():
    from cogdl_tpu.experiments import set_best_config

    kw = set_best_config("gcn", "cora", {"lr": 0.5})
    assert kw["lr"] == 0.5           # user kwargs win
    assert kw["hidden_size"] == 64   # best config fills the rest


MORE_NODE_MODELS = ["deepergcn", "dropedge_gcn", "revgcn", "srgcn", "moe_gcn",
                    "sagn", "m3s", "correct_smooth_mlp", "gcnmix", "drgcn",
                    "drgat", "graph_unet", "autognn", "revgat", "revgen",
                    "actgcn"]


EXTENDED_KW = {  # slower convergers need more budget (measured)
    "revgat": dict(epochs=60, hidden_size=32),
    "revgen": dict(epochs=60, hidden_size=32),
    # GENConv's default update-MLP is now identity (reference default);
    # the identity-MLP model converges slower on SBM (measured: 0.495 @ 60
    # epochs, 0.975 @ 100 under this config)
    "deepergcn": dict(epochs=100),
}


@pytest.mark.parametrize("model", MORE_NODE_MODELS)
def test_node_classification_extended(model):
    """Every extended-zoo model must LEARN SBM (chance = 0.25), not just
    run — tightened per VERDICT r01 (loose ranges let dead models pass)."""
    kw = dict(epochs=25, patience=80, eval_step=5)
    kw.update(EXTENDED_KW.get(model, {}))
    res = train("sbm", model, seed=0, **kw)
    assert res["test_acc"] > 0.5, (model, res)


@pytest.mark.parametrize("attention", ["node", "edge", "gaussian", "ppr",
                                       "heat"])
def test_srgcn_attention_matrix(attention):
    """The SRGCN attention-type matrix (srgcn_utils.py:161) — each type
    trains to well above chance with a fitting normalization."""
    norm = "row_softmax" if attention == "heat" else "row_uniform"
    res = train("sbm", "srgcn", seed=0, epochs=20, patience=30, eval_step=10,
                hidden_size=32, attention=attention, normalization=norm)
    assert res["test_acc"] > 0.7, (attention, res)


@pytest.mark.parametrize("norm", ["identity", "col_uniform", "symmetry"])
def test_srgcn_normalization_matrix(norm):
    res = train("sbm", "srgcn", seed=0, epochs=60, patience=80, eval_step=10,
                hidden_size=32, attention="node", normalization=norm)
    assert res["test_acc"] > 0.7, (norm, res)


def test_heterogeneous_family():
    for m in ("han", "gtn"):
        res = train("hetero-sbm", m, seed=0, epochs=8, eval_step=4)
        assert res["test_acc"] > 0.5


def test_relational_family():
    for m in ("rgcn", "compgcn"):
        res = train("hetero-sbm", m, seed=0, epochs=8, eval_step=4,
                    num_relations=2)
        assert res["test_acc"] > 0.5


def test_kg_family():
    res = train("random-kg", "transe", seed=0, epochs=10, hidden_size=32)
    assert 0.0 <= res["test_mrr"] <= 1.0


def test_unsup_graphsage():
    res = train("sbm", "unsup_graphsage", seed=0, epochs=6, eval_step=3,
                patience=10)
    assert res["test_acc"] > 0.5


def test_traffic_family():
    res = train("traffic-synthetic", "stgcn", seed=0, epochs=3, batch_size=8,
                eval_step=3, hidden_size=16, spatial_channels=8)
    assert res["test_mae"] < 2.0


def test_embedding_families():
    for m in ("deepwalk", "netmf", "hope"):
        res = train("sbm", m, seed=0, hidden_size=16)
        assert res["test_acc"] > 0.6


def test_recommendation_official_split(tmp_path):
    """datasets/rec.py official eval positives flow into
    RecommendationWrapper (no holdout from the train graph)."""
    raw = tmp_path / "raw"
    raw.mkdir()
    rng = np.random.default_rng(0)
    with open(raw / "train.txt", "w") as f:
        for u in range(12):
            items = rng.choice(10, size=4, replace=False)
            f.write(f"{u} " + " ".join(map(str, items)) + "\n")
    with open(raw / "test.txt", "w") as f:
        for u in range(12):
            f.write(f"{u} {rng.integers(0, 10)}\n")
    from cogdl_tpu.datasets import rec

    ds = rec.build("yelp2018", str(tmp_path))
    res = train(ds, "lightgcn", seed=0, epochs=5, eval_step=5,
                hidden_size=16)
    assert 0.0 <= res["test_recall"] <= 1.0


def test_multiplex_official_split(tmp_path):
    raw = tmp_path / "raw"
    raw.mkdir()
    rng = np.random.default_rng(0)
    with open(raw / "train.txt", "w") as f:
        for t in ("1", "2"):
            for _ in range(40):
                u, v = rng.integers(0, 20, 2)
                f.write(f"{t} {u} {v}\n")
    for split in ("valid", "test"):
        with open(raw / f"{split}.txt", "w") as f:
            for t in ("1", "2"):
                for _ in range(8):
                    u, v = rng.integers(0, 20, 2)
                    f.write(f"{t} {u} {v} {rng.integers(0, 2)}\n")
    from cogdl_tpu.datasets import gatne_data

    ds = gatne_data.build("amazon", str(tmp_path))
    res = train(ds, "gatne", seed=0, hidden_size=16, epochs=2)
    assert 0.0 <= res["test_auc"] <= 1.0


def test_link_prediction_official_split(tmp_path):
    raw = tmp_path / "raw"
    (raw / "split").mkdir(parents=True)
    rng = np.random.default_rng(0)
    N = 40
    np.save(raw / "edge_index.npy", rng.integers(0, N, (2, 150)))
    np.save(raw / "node_feat.npy",
            rng.normal(size=(N, 8)).astype(np.float32))
    np.save(raw / "split" / "valid_pos.npy", rng.integers(0, N, (2, 10)))
    np.save(raw / "split" / "test_pos.npy", rng.integers(0, N, (2, 10)))
    np.save(raw / "split" / "test_neg.npy", rng.integers(0, N, (2, 10)))
    from cogdl_tpu.datasets import ogb

    ds = ogb.build_link("ogbl-collab", str(tmp_path))
    res = train(ds, "gcn", wrapper="link_prediction", seed=0, epochs=5,
                eval_step=5, hidden_size=16)
    assert 0.0 <= res["test_auc"] <= 1.0


def test_graph_classification_official_split(tmp_path):
    raw = tmp_path / "raw"
    (raw / "split").mkdir(parents=True)
    rng = np.random.default_rng(0)
    G, n, e = 12, 6, 10
    np.savez(raw / "graphs.npz",
             node_ptr=np.arange(G + 1) * n, edge_ptr=np.arange(G + 1) * e,
             edge_index=rng.integers(0, n, (2, e * G)),
             node_feat=rng.normal(size=(n * G, 4)).astype(np.float32),
             labels=rng.integers(0, 2, G))
    np.save(raw / "split" / "train.npy", np.arange(8))
    np.save(raw / "split" / "valid.npy", np.arange(8, 10))
    np.save(raw / "split" / "test.npy", np.arange(10, 12))
    from cogdl_tpu.datasets import ogb

    ds = ogb.build_graph("ogbg-molhiv", str(tmp_path))
    res = train(ds, "gin", seed=0, epochs=3, eval_step=3, hidden_size=16,
                batch_size=4)
    assert 0.0 <= res["test_acc"] <= 1.0


@pytest.mark.parametrize("task", ["edgemask", "attributemask",
                                  "pairwise-distance"])
def test_self_auxiliary_tasks(task):
    """SSL auxiliary tasks (reference self_auxiliary_mw) train jointly with
    the supervised loss and still classify."""
    res = train("sbm", "gcn", wrapper="self_auxiliary", auxiliary_task=task,
                seed=0, epochs=20, eval_step=10, hidden_size=16)
    assert res["test_acc"] > 0.5
