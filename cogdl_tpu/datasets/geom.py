"""Geom-GCN heterophily datasets (reference cogdl/datasets/geom_data.py):
chameleon / cornell / film / squirrel / texas / wisconsin and the
{cora,citeseer,pubmed}_geom re-splits.

Raw layout under ``<root>/raw``:
  out1_graph_edges.txt              "src\tdst" per line (1 header line)
  out1_node_feature_label.txt       "id\tf1,f2,...\tlabel" (1 header line);
                                    for film the feature field is a list of
                                    active indices into a 932-dim one-hot
                                    (geom_data.py:22-31)
  <name>_split_0.6_0.2_<k>.npz      k in 0..9, arrays train/val/test_mask

``split`` selects one of the 10 published splits (geom_data.py:63-73).
"""

from __future__ import annotations

import os

import numpy as np

from ..data.graph import from_coo
from .dataset import Dataset

FILM_DIM = 932


def build(name: str, root: str, split: int = 0, **kwargs) -> Dataset:
    raw = os.path.join(root, "raw")
    edges_path = os.path.join(raw, "out1_graph_edges.txt")
    feats_path = os.path.join(raw, "out1_node_feature_label.txt")
    base = name[:-5] if name.endswith("_geom") else name
    split_path = os.path.join(raw, f"{base}_split_0.6_0.2_{split}.npz")
    if not os.path.exists(split_path):
        split_path = os.path.join(raw, f"{name}_split_0.6_0.2_{split}.npz")
    missing = [p for p in (edges_path, feats_path, split_path)
               if not os.path.exists(p)]
    if missing:
        raise FileNotFoundError(
            f"geom dataset {name!r}: place out1_graph_edges.txt, "
            f"out1_node_feature_label.txt and the 10 "
            f"*_split_0.6_0.2_<k>.npz files under {raw}. Missing: {missing}")

    feats, labels = {}, {}
    with open(feats_path) as f:
        f.readline()
        for line in f:
            nid, feat, label = line.rstrip().split("\t")
            idx = np.array(feat.split(","), np.int64)
            if base == "film":
                vec = np.zeros(FILM_DIM, np.float32)
                vec[idx] = 1.0
            else:
                vec = idx.astype(np.float32)
            feats[int(nid)] = vec
            labels[int(nid)] = int(label)
    N = max(feats) + 1
    x = np.zeros((N, len(next(iter(feats.values())))), np.float32)
    y = np.zeros(N, np.int32)
    for nid, vec in feats.items():
        x[nid] = vec
        y[nid] = labels[nid]

    rows, cols = [], []
    with open(edges_path) as f:
        f.readline()
        for line in f:
            s, d = line.rstrip().split("\t")
            # directed edge s→d; message flows source→destination, so the
            # CSR row (destination) is d (reference keeps the graph
            # asymmetric: geom_data.py:105 set_asymmetric)
            rows.append(int(d))
            cols.append(int(s))

    with np.load(split_path) as sf:
        train_mask = sf["train_mask"].astype(bool)
        val_mask = sf["val_mask"].astype(bool)
        test_mask = sf["test_mask"].astype(bool)

    g = from_coo(np.stack([np.asarray(rows), np.asarray(cols)]),
                 num_nodes=N, x=x, y=y,
                 train_mask=train_mask, val_mask=val_mask,
                 test_mask=test_mask,
                 meta={"num_classes": int(y.max()) + 1, "name": name})
    return Dataset.from_graph(g, name=name)
