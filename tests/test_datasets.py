"""Dataset loaders: format parsers round-trip against synthetic files written
in each reference format (planetoid pickles excepted — covered by error-path
tests since constructing the exact pickle layout is the downloader's job)."""

import json
import os
import pickle

import numpy as np
import pytest

from cogdl_tpu.datasets import DATA_ROOT, build_dataset
from cogdl_tpu.datasets.customized import (
    GraphDataset,
    NodeDataset,
    generate_random_graph,
)


def test_registry_missing_files_message():
    for name in ("cora", "fb15k", "blogcatalog", "flickr"):
        with pytest.raises(FileNotFoundError):
            build_dataset(name)


def test_unknown_name():
    with pytest.raises(ValueError):
        build_dataset("definitely-not-a-dataset")


def test_saint_format_roundtrip(tmp_path, monkeypatch):
    import scipy.sparse as sp

    from cogdl_tpu.datasets import saint

    raw = tmp_path / "raw"
    raw.mkdir()
    N = 30
    rng = np.random.default_rng(0)
    A = sp.random(N, N, density=0.1, random_state=0, format="csr")
    sp.save_npz(raw / "adj_full.npz", A)
    np.save(raw / "feats.npy", rng.normal(size=(N, 5)))
    with open(raw / "class_map.json", "w") as f:
        json.dump({str(i): int(i % 3) for i in range(N)}, f)
    with open(raw / "role.json", "w") as f:
        json.dump({"tr": list(range(20)), "va": list(range(20, 25)),
                   "te": list(range(25, 30))}, f)
    ds = saint.build("flickr", str(tmp_path))
    assert ds.graph.num_nodes == N
    assert ds.num_classes == 3
    assert int(np.asarray(ds.graph.train_mask).sum()) == 20


def test_kg_format_roundtrip(tmp_path):
    from cogdl_tpu.datasets import kg

    raw = tmp_path / "raw"
    raw.mkdir()
    rng = np.random.default_rng(0)
    for split, n in (("train", 50), ("valid", 10), ("test", 10)):
        with open(raw / f"{split}.txt", "w") as f:
            for _ in range(n):
                f.write(f"e{rng.integers(0, 20)}\tr{rng.integers(0, 4)}\t"
                        f"e{rng.integers(0, 20)}\n")
    ds = kg.build("fb15k", str(tmp_path))
    assert ds.triples["train"].shape[1] == 3
    assert ds.triples["num_relations"] <= 4


def test_tu_format_roundtrip(tmp_path):
    from cogdl_tpu.datasets import tu

    raw = tmp_path / "raw"
    raw.mkdir()
    # two triangles as two graphs, 1-based ids
    with open(raw / "MUTAG_A.txt", "w") as f:
        for a, b in [(1, 2), (2, 3), (3, 1), (4, 5), (5, 6), (6, 4)]:
            f.write(f"{a}, {b}\n")
    with open(raw / "MUTAG_graph_indicator.txt", "w") as f:
        f.write("\n".join(["1"] * 3 + ["2"] * 3))
    with open(raw / "MUTAG_graph_labels.txt", "w") as f:
        f.write("1\n-1\n")
    ds = tu.build("mutag", str(tmp_path))
    assert len(ds.graphs) == 2
    assert ds.graphs[0].num_edges == 3
    assert set(ds.labels.tolist()) == {0, 2} or set(ds.labels.tolist()) == {0, 1}


def test_matlab_format_roundtrip(tmp_path):
    import scipy.sparse as sp
    from scipy.io import savemat

    from cogdl_tpu.datasets import matlab

    raw = tmp_path / "raw"
    raw.mkdir()
    N = 20
    A = sp.random(N, N, density=0.2, random_state=0, format="csr")
    groups = sp.csr_matrix((np.ones(N), (np.arange(N), np.arange(N) % 3)),
                           shape=(N, 3))
    savemat(raw / "blogcatalog.mat", {"network": A, "group": groups})
    ds = matlab.build("blogcatalog", str(tmp_path))
    assert ds.graph.num_nodes == N
    assert ds.num_classes == 3


def test_node_dataset_from_arrays():
    rng = np.random.default_rng(0)
    ei = rng.integers(0, 40, size=(2, 120))
    x = rng.normal(size=(40, 7)).astype(np.float32)
    y = rng.integers(0, 3, 40)
    ds = NodeDataset(edge_index=ei, x=x, y=y)
    g = ds.graph
    assert g.num_nodes == 40 and ds.num_classes == 3
    assert int(np.asarray(g.train_mask).sum()) == 24


def test_node_dataset_from_npz(tmp_path):
    rng = np.random.default_rng(0)
    p = str(tmp_path / "data.npz")
    np.savez(p, edge_index=rng.integers(0, 10, (2, 30)),
             x=rng.normal(size=(10, 4)).astype(np.float32),
             y=rng.integers(0, 2, 10))
    ds = NodeDataset(path=p)
    assert ds.graph.num_nodes == 10


def test_graph_dataset_and_random_graph():
    gs = [generate_random_graph(20, 60, 4, seed=i) for i in range(5)]
    ds = GraphDataset(gs, labels=[0, 1, 0, 1, 0])
    assert len(ds) == 5


def test_ogb_npy_roundtrip(tmp_path):
    from cogdl_tpu.datasets import ogb

    raw = tmp_path / "raw"
    (raw / "split").mkdir(parents=True)
    rng = np.random.default_rng(0)
    N = 25
    np.save(raw / "edge_index.npy", rng.integers(0, N, (2, 100)))
    np.save(raw / "node_feat.npy", rng.normal(size=(N, 6)))
    np.save(raw / "labels.npy", rng.integers(0, 4, N))
    np.save(raw / "split" / "train.npy", np.arange(15))
    np.save(raw / "split" / "valid.npy", np.arange(15, 20))
    np.save(raw / "split" / "test.npy", np.arange(20, 25))
    ds = ogb.build_node("ogbn-arxiv", str(tmp_path))
    assert ds.graph.num_nodes == N
    assert ds.num_classes == 4
