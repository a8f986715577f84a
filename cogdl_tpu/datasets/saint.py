"""GraphSAINT-format loader (reference cogdl/datasets/saint_data.py):
``adj_full.npz`` (scipy CSR), ``feats.npy``, ``class_map.json``,
``role.json`` under <root>/raw. Covers yelp/flickr/reddit/ppi/amazon-s."""

from __future__ import annotations

import json
import os

import numpy as np

from ..data.graph import from_coo
from .dataset import Dataset

MULTILABEL = {"yelp", "ppi", "ppi-large", "amazon-s"}


def build(name: str, root: str, **kwargs) -> Dataset:
    raw = os.path.join(root, "raw")
    needed = ["adj_full.npz", "feats.npy", "class_map.json", "role.json"]
    missing = [f for f in needed if not os.path.exists(os.path.join(raw, f))]
    if missing:
        raise FileNotFoundError(
            f"saint dataset {name!r}: place {needed} under {raw} "
            f"(GraphSAINT format). Missing: {missing}")
    import scipy.sparse as sp

    adj = sp.load_npz(os.path.join(raw, "adj_full.npz")).tocoo()
    feats = np.load(os.path.join(raw, "feats.npy")).astype(np.float32)
    with open(os.path.join(raw, "class_map.json")) as f:
        class_map = json.load(f)
    with open(os.path.join(raw, "role.json")) as f:
        role = json.load(f)
    N = feats.shape[0]
    first = next(iter(class_map.values()))
    if isinstance(first, list):
        C = len(first)
        y = np.zeros((N, C), np.float32)
        for k, v in class_map.items():
            y[int(k)] = v
    else:
        y = np.zeros(N, np.int32)
        for k, v in class_map.items():
            y[int(k)] = v
        C = int(y.max()) + 1
    train_mask = np.zeros(N, bool)
    val_mask = np.zeros(N, bool)
    test_mask = np.zeros(N, bool)
    train_mask[role["tr"]] = True
    val_mask[role["va"]] = True
    test_mask[role["te"]] = True
    g = from_coo(np.stack([adj.row, adj.col]), num_nodes=N, x=feats, y=y,
                 train_mask=train_mask, val_mask=val_mask, test_mask=test_mask,
                 meta={"num_classes": C, "name": name,
                       "multilabel": name in MULTILABEL})
    return Dataset.from_graph(
        g, name=name,
        metric="microf1" if name in MULTILABEL else "accuracy")
