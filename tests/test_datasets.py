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


def test_geom_format_roundtrip(tmp_path):
    from cogdl_tpu.datasets import geom

    raw = tmp_path / "raw"
    raw.mkdir()
    N = 8
    rng = np.random.default_rng(0)
    with open(raw / "out1_node_feature_label.txt", "w") as f:
        f.write("id\tfeat\tlabel\n")
        for i in range(N):
            feat = ",".join(str(v) for v in rng.integers(0, 2, 5))
            f.write(f"{i}\t{feat}\t{i % 3}\n")
    with open(raw / "out1_graph_edges.txt", "w") as f:
        f.write("src\tdst\n")
        for i in range(N):
            f.write(f"{i}\t{(i + 1) % N}\n")
    for k in range(2):
        m = np.zeros(N, bool)
        tr, va, te = m.copy(), m.copy(), m.copy()
        tr[:5], va[5:6], te[6:] = True, True, True
        np.savez(raw / f"texas_split_0.6_0.2_{k}.npz",
                 train_mask=tr, val_mask=va, test_mask=te)
    ds = geom.build("texas", str(tmp_path), split=1)
    assert ds.graph.num_nodes == N and ds.num_classes == 3
    assert int(np.asarray(ds.graph.train_mask).sum()) == 5


def test_geom_film_multihot(tmp_path):
    from cogdl_tpu.datasets import geom

    raw = tmp_path / "raw"
    raw.mkdir()
    N = 4
    with open(raw / "out1_node_feature_label.txt", "w") as f:
        f.write("id\tfeat\tlabel\n")
        for i in range(N):
            f.write(f"{i}\t{i},{i + 10}\t{i % 2}\n")
    with open(raw / "out1_graph_edges.txt", "w") as f:
        f.write("src\tdst\n0\t1\n1\t2\n2\t3\n")
    m = np.zeros(N, bool)
    np.savez(raw / "film_split_0.6_0.2_0.npz",
             train_mask=~m, val_mask=m, test_mask=m)
    ds = geom.build("film", str(tmp_path))
    assert ds.graph.x.shape[1] == geom.FILM_DIM
    assert float(np.asarray(ds.graph.x)[2, 12]) == 1.0


def test_rd2cd_format_roundtrip(tmp_path):
    from cogdl_tpu.datasets import rd2cd

    raw = tmp_path / "raw"
    raw.mkdir()
    rng = np.random.default_rng(0)
    N = 30
    y = rng.integers(0, 3, N)
    y[:3] = -1  # unlabeled nodes are excluded from all splits
    np.save(raw / "x.npy", rng.normal(size=(N, 5)).astype(np.float32))
    np.save(raw / "y.npy", y)
    np.save(raw / "edge_index.npy", rng.integers(0, N, (2, 80)))
    ds = rd2cd.build("Github", str(tmp_path))
    g = ds.graph
    tr = np.asarray(g.train_mask)[:N]
    assert not tr[y == -1].any()
    total = int(tr.sum() + np.asarray(g.val_mask).sum()
                + np.asarray(g.test_mask).sum())
    assert total == (y != -1).sum()
    # every class present in train (reference check_train_containing)
    assert set(np.asarray(g.y)[:N][tr]) == {0, 1, 2}


def test_grb_format_roundtrip(tmp_path):
    import scipy.sparse as sp

    from cogdl_tpu.datasets import grb

    raw = tmp_path / "raw"
    raw.mkdir()
    rng = np.random.default_rng(0)
    N = 20
    A = sp.random(N, N, density=0.2, random_state=0, format="csr")
    sp.save_npz(raw / "adj.npz", A)
    np.savez(raw / "features.npz", data=rng.normal(size=(N, 6)))
    np.savez(raw / "labels.npz", data=rng.integers(0, 3, N))
    np.savez(raw / "index.npz",
             index_train=np.arange(10), index_val=np.arange(10, 14),
             index_test=np.arange(14, 20), index_test_easy=np.arange(14, 16),
             index_test_medium=np.arange(16, 18),
             index_test_hard=np.arange(18, 20))
    ds = grb.build("grb-cora", str(tmp_path), mode="easy",
                   feat_norm="arctan")
    assert int(np.asarray(ds.graph.test_mask).sum()) == 2
    assert float(np.abs(np.asarray(ds.graph.x)[:N]).max()) <= 1.0
    ds_full = grb.build("grb-cora", str(tmp_path))
    assert int(np.asarray(ds_full.graph.test_mask).sum()) == 6


def test_gtn_format_roundtrip(tmp_path):
    import scipy.sparse as sp

    from cogdl_tpu.datasets import hetero

    raw = tmp_path / "raw"
    raw.mkdir()
    rng = np.random.default_rng(0)
    N = 12
    edges = [sp.random(N, N, density=0.15, random_state=s, format="csr")
             for s in range(4)]
    with open(raw / "edges.pkl", "wb") as f:
        pickle.dump(edges, f)
    nodes = rng.permutation(N)
    labels = [np.stack([nodes[:6], rng.integers(0, 3, 6)], 1),
              np.stack([nodes[6:9], rng.integers(0, 3, 3)], 1),
              np.stack([nodes[9:], rng.integers(0, 3, 3)], 1)]
    with open(raw / "labels.pkl", "wb") as f:
        pickle.dump(labels, f)
    with open(raw / "node_features.pkl", "wb") as f:
        pickle.dump(rng.normal(size=(N, 7)).astype(np.float32), f)
    ds = hetero.build_gtn("gtn-acm", str(tmp_path))
    g = ds.graph
    assert len(g.extras["metapath_graphs"]) == 4
    assert int(np.asarray(g.train_mask).sum()) == 6
    assert g.meta_get("num_relations") == 4


def test_han_format_roundtrip(tmp_path):
    import scipy.io as sio

    from cogdl_tpu.datasets import hetero

    raw = tmp_path / "raw"
    raw.mkdir()
    rng = np.random.default_rng(0)
    N = 10
    nets = {}
    for k in ("PAP", "PLP"):
        a = (rng.random((N, N)) < 0.3).astype(np.float64)
        np.fill_diagonal(a, 1.0)  # reference subtracts the identity
        nets[k] = a
    y = np.zeros((N, 3))
    y[np.arange(N), rng.integers(0, 3, N)] = 1
    sio.savemat(raw / "data.mat", {
        "label": y, "feature": rng.normal(size=(N, 5)),
        "train_idx": np.arange(6)[None], "val_idx": np.arange(6, 8)[None],
        "test_idx": np.arange(8, 10)[None], **nets})
    ds = hetero.build_han("han-acm", str(tmp_path))
    g = ds.graph
    assert len(g.extras["metapath_graphs"]) == 2
    assert int(np.asarray(g.train_mask).sum()) == 6


def test_gcc_edgelist_roundtrip(tmp_path):
    from cogdl_tpu.datasets import gcc

    raw = tmp_path / "raw"
    raw.mkdir()
    with open(raw / "edgelist.txt", "w") as f:
        for i in range(10):
            f.write(f"{100 + i} {100 + (i + 1) % 10}\n")
    with open(raw / "nodelabel.txt", "w") as f:
        for i in range(10):
            f.write(f"{100 + i} {i % 2 + 5}\n")  # labels remapped to 0..1
    ds = gcc.build_edgelist("usa-airport", str(tmp_path))
    assert ds.graph.num_nodes == 10
    assert ds.num_classes == 2


def test_gcc_hindex_median_binarize(tmp_path):
    from cogdl_tpu.datasets import gcc

    raw = tmp_path / "raw"
    raw.mkdir()
    with open(raw / "edgelist.txt", "w") as f:
        for i in range(8):
            f.write(f"{i} {(i + 1) % 8}\n")
    with open(raw / "nodelabel.txt", "w") as f:
        for i in range(8):
            f.write(f"{i} {i * 10}\n")  # h-index values
    ds = gcc.build_edgelist("h-index", str(tmp_path))
    y = np.asarray(ds.graph.y)[:8]
    assert set(y.tolist()) == {0, 1}


def test_gcc_paired_roundtrip(tmp_path):
    from cogdl_tpu.datasets import gcc

    raw = tmp_path / "raw"
    raw.mkdir()
    for part in ("kdd", "icdm"):
        with open(raw / f"{part}.graph", "w") as f:
            f.write("header\n")
            for i in range(6):
                f.write(f"{i} {(i + 1) % 6} 2\n")
        with open(raw / f"{part}.dict", "w") as f:
            f.write("alice\t0\nbob\t1\n")
    ds = gcc.build_paired("kdd_icdm", str(tmp_path))
    assert len(ds.graphs) == 2
    assert ds.name_maps[0]["alice"] == 0


def test_rec_format_roundtrip(tmp_path):
    from cogdl_tpu.datasets import rec

    raw = tmp_path / "raw"
    raw.mkdir()
    with open(raw / "train.txt", "w") as f:
        f.write("0 0 1 2\n1 1 3\n2 0 2\n")
    with open(raw / "test.txt", "w") as f:
        f.write("0 3\n1 0\n")
    ds = rec.build("yelp2018", str(tmp_path))
    g = ds.graph
    assert g.meta_get("num_users") == 3 and g.meta_get("num_items") == 4
    assert set(ds.eval_user_items) == {0, 1}
    # train graph has both directions of the 7 interactions
    assert g.num_edges == 14


def test_rec_pair_format_offsets(tmp_path):
    from cogdl_tpu.datasets import rec

    raw = tmp_path / "raw"
    raw.mkdir()
    # pair format: items arrive offset by n_users (3 users, items 3..6)
    with open(raw / "train.txt", "w") as f:
        f.write("0 3\n0 4\n1 5\n2 6\n")
    with open(raw / "valid.txt", "w") as f:
        f.write("0 5\n")
    with open(raw / "test.txt", "w") as f:
        f.write("1 3\n2 4\n")
    ds = rec.build("ali", str(tmp_path))
    assert ds.graph.meta_get("num_users") == 3
    assert ds.graph.meta_get("num_items") == 4
    assert ds.eval_user_items[1].tolist() == [0]


def test_pems_format_roundtrip(tmp_path):
    from cogdl_tpu.datasets import traffic_pems

    raw = tmp_path / "raw"
    raw.mkdir()
    rng = np.random.default_rng(0)
    N, T = 5, 40
    W = rng.random((N, N)) * (rng.random((N, N)) < 0.5)
    with open(raw / f"W_{N}.csv", "w") as f:
        f.write(",".join(f"s{i}" for i in range(N)) + "\n")
        for r in W:
            f.write(",".join(str(v) for v in r) + "\n")
    with open(raw / f"V_{N}.csv", "w") as f:
        f.write("timestamp," + ",".join(f"s{i}" for i in range(N)) + "\n")
        for t in range(T):
            f.write(f"t{t}," + ",".join(
                str(v) for v in rng.random(N) * 60) + "\n")
    ds = traffic_pems.build("pems-stgcn", str(tmp_path), num_stations=N)
    assert ds.metric == "mae"
    series = np.asarray(ds.graph.extras["series"])
    assert series.shape[0] == T and series.shape[2] == 1
    assert abs(float(series[:, :N].mean())) < 1e-5  # z-scored


def test_gatne_format_roundtrip(tmp_path):
    from cogdl_tpu.datasets import gatne_data

    raw = tmp_path / "raw"
    raw.mkdir()
    with open(raw / "train.txt", "w") as f:
        for t in ("1", "2"):
            for i in range(6):
                f.write(f"{t} n{i} n{(i + 1) % 6}\n")
    with open(raw / "valid.txt", "w") as f:
        f.write("1 n0 n2 1\n1 n0 n3 0\n2 n1 n4 1\n2 n1 n5 0\n")
    with open(raw / "test.txt", "w") as f:
        f.write("1 n2 n4 1\n1 n2 n5 0\n2 n3 n0 1\n2 n3 n1 0\n")
    ds = gatne_data.build("amazon", str(tmp_path))
    assert ds.graph.meta_get("num_relations") == 2
    assert ds.graph.num_edges == 24  # 12 typed edges, both directions
    pos, neg = ds.multiplex_eval[0]["test"]
    assert pos.shape == (2, 1) and neg.shape == (2, 1)


def test_oagbert_eval_roundtrip(tmp_path):
    from cogdl_tpu.datasets import oagbert_eval

    raw = tmp_path / "raw"
    raw.mkdir()
    with open(raw / "._SUCCESS", "w") as f:
        f.write("physics\nbiology\n")
    with open(raw / "part-0.jsonl", "w") as f:
        f.write(json.dumps({"title": "a paper", "label": "physics"}) + "\n")
    ds = oagbert_eval.build("l0fos", str(tmp_path))
    assert ds.candidates == ["physics", "biology"]
    assert len(ds.samples["part-0.jsonl"]) == 1


def test_ogb_graph_roundtrip(tmp_path):
    from cogdl_tpu.datasets import ogb

    raw = tmp_path / "raw"
    (raw / "split").mkdir(parents=True)
    rng = np.random.default_rng(0)
    G = 6
    node_ptr = np.arange(G + 1) * 5
    edge_ptr = np.arange(G + 1) * 8
    ei = rng.integers(0, 5, (2, 8 * G))
    np.savez(raw / "graphs.npz", node_ptr=node_ptr, edge_ptr=edge_ptr,
             edge_index=ei, node_feat=rng.normal(size=(5 * G, 4)),
             labels=rng.integers(0, 2, G))
    np.save(raw / "split" / "train.npy", np.arange(4))
    np.save(raw / "split" / "valid.npy", np.asarray([4]))
    np.save(raw / "split" / "test.npy", np.asarray([5]))
    ds = ogb.build_graph("ogbg-molhiv", str(tmp_path))
    assert len(ds.graphs) == G
    assert ds.split_idx["train"].tolist() == [0, 1, 2, 3]
    assert ds.graphs[0].num_nodes == 5


def test_ogb_link_roundtrip(tmp_path):
    from cogdl_tpu.datasets import ogb

    raw = tmp_path / "raw"
    (raw / "split").mkdir(parents=True)
    rng = np.random.default_rng(0)
    N = 20
    np.save(raw / "edge_index.npy", rng.integers(0, N, (2, 60)))
    np.save(raw / "node_feat.npy", rng.normal(size=(N, 4)))
    np.save(raw / "split" / "valid_pos.npy", rng.integers(0, N, (2, 5)))
    np.save(raw / "split" / "test_pos.npy", rng.integers(0, N, (2, 5)))
    np.save(raw / "split" / "test_neg.npy", rng.integers(0, N, (2, 5)))
    ds = ogb.build_link("ogbl-collab", str(tmp_path))
    assert ds.graph.num_nodes == N
    assert set(ds.link_split) == {"valid", "test"}


def test_registry_covers_reference_names():
    """Every dataset name in the reference registry
    (cogdl/datasets/__init__.py:118-223) resolves here too."""
    from cogdl_tpu.datasets import SUPPORTED_DATASETS

    reference_names = [
        "gcc_academic", "gcc_dblp_netrep", "gcc_dblp_snap", "gcc_facebook",
        "gcc_imdb", "gcc_livejournal", "kdd_icdm", "sigir_cikm",
        "sigmod_icde", "usa-airport", "h-index", "ogbn-arxiv",
        "ogbn-products", "ogbn-proteins", "ogbn-papers100M", "ogbg-molbace",
        "ogbg-molhiv", "ogbg-molpcba", "ogbg-ppa", "ogbg-code", "ogbl-ppa",
        "ogbl-ddi", "ogbl-collab", "ogbl-citation2", "amazon", "twitter",
        "youtube", "gtn-acm", "gtn-dblp", "gtn-imdb", "fb13", "fb15k",
        "fb15k237", "wn18", "wn18rr", "fb13s", "cora", "citeseer", "pubmed",
        "chameleon", "cornell", "film", "squirrel", "texas", "wisconsin",
        "cora_geom", "citeseer_geom", "pubmed_geom", "blogcatalog",
        "flickr-ne", "dblp-ne", "youtube-ne", "wikipedia", "ppi-ne",
        "han-acm", "han-dblp", "han-imdb", "mutag", "imdb-b", "imdb-m",
        "collab", "proteins", "reddit-b", "reddit-multi-5k",
        "reddit-multi-12k", "ptc-mr", "nci1", "nci109", "enzymes", "yelp",
        "amazon-s", "flickr", "reddit", "ppi", "ppi-large", "l0fos", "aff30",
        "arxivvenue", "yelp2018", "ali", "amazon-rec", "Github", "Elliptic",
        "Film", "Wiki", "Clothing", "Electronics", "Dblp", "Yelpchi",
        "Alpha", "Weibo", "bgp", "ssn5", "ssn7", "Aids", "Nba", "Pokec_z",
        "grb-cora", "grb-citeseer", "grb-reddit", "grb-aminer", "grb-flickr",
        "pems-stgcn", "pems-stgat",
    ]
    missing = [n for n in reference_names if n not in SUPPORTED_DATASETS]
    assert not missing, f"registry missing reference names: {missing}"


def test_dgraphfin_format_roundtrip(tmp_path):
    from cogdl_tpu.datasets import dgraphfin

    raw = tmp_path / "raw"
    raw.mkdir()
    rng = np.random.default_rng(0)
    N = 40
    tr = rng.choice(N, 10, replace=False)
    rest = np.setdiff1d(np.arange(N), tr)
    va, te = rest[:10], rest[10:20]
    np.savez(raw / "dgraphfin.npz",
             x=rng.normal(size=(N, 17)).astype(np.float32),
             y=rng.integers(0, 2, N),
             edge_index=rng.integers(0, N, (90, 2)),
             train_mask=tr, valid_mask=va, test_mask=te)
    ds = dgraphfin.build("dgraphfin", str(tmp_path))
    g = ds.graph
    assert int(np.asarray(g.train_mask).sum()) == 10
    assert int(np.asarray(g.val_mask).sum()) == 10
    assert int(np.asarray(g.test_mask).sum()) == 10
    assert g.num_edges == 90 and ds.num_classes == 2
    # feature normalization applied
    xr = np.asarray(g.x)[:N]
    np.testing.assert_allclose(xr.mean(0), 0.0, atol=1e-4)


# ---------------------------------------------------------------------------
# download lifecycle (cogdl_tpu/datasets/download.py) — exercised offline via
# file:// URLs; proves fetch → verify → extract → place → load end-to-end
# ---------------------------------------------------------------------------


def _planetoid_raw_files(folder, name="cora", n=30, f=12, c=3):
    """Write a minimal valid kimiyoung/planetoid raw set and return paths."""
    import pickle

    import scipy.sparse as sp

    rng = np.random.default_rng(5)
    n_test = 8
    n_all = n - n_test
    x_n = 6
    paths = {}

    def dump(part, obj):
        p = folder / f"ind.{name}.{part}"
        with open(p, "wb") as fh:
            pickle.dump(obj, fh)
        paths[part] = p

    def onehot(k):
        y = np.zeros((k, c), np.int32)
        y[np.arange(k), rng.integers(0, c, k)] = 1
        return y

    dump("x", sp.csr_matrix(rng.normal(size=(x_n, f)).astype(np.float32)))
    dump("y", onehot(x_n))
    dump("tx", sp.csr_matrix(rng.normal(size=(n_test, f)).astype(np.float32)))
    dump("ty", onehot(n_test))
    dump("allx", sp.csr_matrix(rng.normal(size=(n_all, f)).astype(np.float32)))
    dump("ally", onehot(n_all))
    graph = {i: list(np.unique(rng.integers(0, n, 3))) for i in range(n)}
    dump("graph", graph)
    ti = folder / f"ind.{name}.test.index"
    np.savetxt(ti, np.arange(n_all, n)[::-1], fmt="%d")
    paths["test.index"] = ti
    return paths


def test_download_url_file_scheme_and_md5(tmp_path):
    import hashlib

    from cogdl_tpu.datasets.download import check_md5, download_url

    src = tmp_path / "src.bin"
    src.write_bytes(b"cogdl-tpu raw payload")
    md5 = hashlib.md5(src.read_bytes()).hexdigest()
    dst_dir = tmp_path / "out"
    p = download_url(src.as_uri(), str(dst_dir), md5=md5, log=False)
    assert open(p, "rb").read() == b"cogdl-tpu raw payload"
    assert check_md5(p, md5)
    # md5 mismatch: raises, leaves NO file behind (atomicity)
    with pytest.raises(OSError):
        download_url(src.as_uri(), str(dst_dir), name="bad.bin",
                     md5="0" * 32, log=False)
    assert not (dst_dir / "bad.bin").exists()
    assert not (dst_dir / "bad.bin.part").exists()
    # unreachable URL: raises with placement instructions, no partial file
    with pytest.raises(OSError, match="manually"):
        download_url((tmp_path / "missing.bin").as_uri(), str(dst_dir),
                     log=False)


def test_extract_archive_zip_and_gz(tmp_path):
    import gzip
    import zipfile

    from cogdl_tpu.datasets.download import extract_archive

    z = tmp_path / "a.zip"
    with zipfile.ZipFile(z, "w") as zf:
        zf.writestr("inner/data.txt", "zipped")
    extract_archive(str(z), delete=True)
    assert (tmp_path / "inner/data.txt").read_text() == "zipped"
    assert not z.exists()

    g = tmp_path / "b.txt.gz"
    with gzip.open(g, "wb") as fh:
        fh.write(b"gzipped")
    extract_archive(str(g))
    assert (tmp_path / "b.txt").read_bytes() == b"gzipped"


def test_fetch_dataset_end_to_end(tmp_path, monkeypatch):
    """The full lifecycle: registry → file:// fetch → placed under
    root/<name>/raw → the planetoid loader builds a real Dataset from it."""
    from cogdl_tpu.datasets import download as dl
    from cogdl_tpu.datasets import planetoid

    srv = tmp_path / "server"
    srv.mkdir()
    paths = _planetoid_raw_files(srv, "cora")
    spec = dl.DatasetFiles(
        subdir="cora/raw",
        files=[dl.RawFile(url=p.as_uri(), filename=f"ind.cora.{part}")
               for part, p in paths.items()])
    monkeypatch.setitem(dl.DATASET_URLS, "cora", spec)
    root = tmp_path / "data"
    folder = dl.fetch_dataset("cora", root=str(root), log=False)
    assert folder == str(root / "cora/raw")
    ds = planetoid.build("cora", str(root / "cora"))
    assert ds.graph.num_nodes >= 30 and ds.num_classes == 3

    with pytest.raises(KeyError, match="registry"):
        dl.fetch_dataset("no-such-dataset")


def test_fetch_tu_zip_upstream_layout(tmp_path, monkeypatch):
    """TU lifecycle: a file:// zip in the UPSTREAM layout
    (PTC_MR/PTC_MR_A.txt inside the archive) fetched + extracted, then the
    loader resolves the nested canonical layout."""
    import io
    import zipfile

    from cogdl_tpu.datasets import download as dl
    from cogdl_tpu.datasets import tu

    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        z.writestr("PTC_MR/PTC_MR_A.txt",
                   "\n".join(f"{a}, {b}" for a, b in
                             [(1, 2), (2, 3), (3, 1), (4, 5), (5, 6), (6, 4)]))
        z.writestr("PTC_MR/PTC_MR_graph_indicator.txt",
                   "\n".join(["1"] * 3 + ["2"] * 3))
        z.writestr("PTC_MR/PTC_MR_graph_labels.txt", "1\n-1\n")
    srv = tmp_path / "PTC_MR.zip"
    srv.write_bytes(buf.getvalue())

    spec = dl.DatasetFiles(
        subdir="ptc-mr/raw",
        files=[dl.RawFile(url=srv.as_uri(), extract=True)])
    monkeypatch.setitem(dl.DATASET_URLS, "ptc-mr", spec)
    root = tmp_path / "data"
    dl.fetch_dataset("ptc-mr", root=str(root), log=False)
    ds = tu.build("ptc-mr", str(root / "ptc-mr"))
    assert len(ds.graphs) == 2


def test_download_registry_names_are_supported():
    from cogdl_tpu.datasets import SUPPORTED_DATASETS
    from cogdl_tpu.datasets.download import DATASET_URLS

    unknown = set(DATASET_URLS) - set(SUPPORTED_DATASETS)
    assert not unknown, f"registry names missing loaders: {unknown}"
