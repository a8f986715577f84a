"""Recommendation datasets (reference cogdl/datasets/rec_data.py):
yelp2018 / ali / amazon-rec for LightGCN.

Raw layout under ``<root>/raw``: ``train.txt``, ``test.txt`` (+``valid.txt``
for ali/amazon-rec; yelp2018 reuses test as valid — rec_data.py:125-130).
yelp2018 lines are adjacency lists ``u i1 i2 ...``; ali/amazon-rec are
``u i`` pairs with item ids offset by n_users (rec_data.py:12-38).

The Dataset's graph holds only the TRAIN interactions (symmetric bipartite,
items offset by num_users) — matching the reference, whose normalized
adjacency is built from train_cf only (rec_data.py:93). Official eval
positives are carried as ``Dataset.eval_user_items`` / ``valid_user_items``
(user → item-id array, 0-based) which RecommendationWrapper consumes instead
of holding out training edges.
"""

from __future__ import annotations

import os
from collections import defaultdict

import numpy as np

from ..data.graph import from_coo
from .dataset import Dataset

PAIR_FORMAT = {"ali", "amazon-rec"}


def _read_cf(path, pair_format: bool):
    pairs = []
    with open(path) as f:
        for line in f:
            ids = [int(i) for i in line.split()]
            if not ids:
                continue
            if pair_format:
                pairs.append(ids[:2])
            else:
                u = ids[0]
                for i in sorted(set(ids[1:])):
                    pairs.append([u, i])
    return np.asarray(pairs, np.int64).reshape(-1, 2)


def _user_sets(pairs):
    d = defaultdict(list)
    for u, i in pairs:
        d[int(u)].append(int(i))
    return {u: np.asarray(v, np.int64) for u, v in d.items()}


def build(name: str, root: str, **kwargs) -> Dataset:
    raw = os.path.join(root, "raw")
    pair_format = name in PAIR_FORMAT
    needed = ["train.txt", "test.txt"] + (["valid.txt"] if pair_format else [])
    missing = [f for f in needed if not os.path.exists(os.path.join(raw, f))]
    if missing:
        raise FileNotFoundError(
            f"rec dataset {name!r}: place {needed} under {raw}. "
            f"Missing: {missing}")
    train = _read_cf(os.path.join(raw, "train.txt"), pair_format)
    test = _read_cf(os.path.join(raw, "test.txt"), pair_format)
    valid = (_read_cf(os.path.join(raw, "valid.txt"), pair_format)
             if pair_format else test)
    n_users = int(max(train[:, 0].max(), valid[:, 0].max(),
                      test[:, 0].max())) + 1
    n_items = int(max(train[:, 1].max(), valid[:, 1].max(),
                      test[:, 1].max())) + 1
    if pair_format:
        # items arrive offset by n_users (rec_data.py:33-38)
        n_items -= n_users
        for arr in (train, valid, test):
            arr[:, 1] -= n_users

    users = train[:, 0]
    items = train[:, 1] + n_users
    row = np.concatenate([users, items])
    col = np.concatenate([items, users])
    g = from_coo(np.stack([row, col]), num_nodes=n_users + n_items,
                 meta={"num_users": n_users, "num_items": n_items,
                       "name": name})
    ds = Dataset.from_graph(g, name=name, metric="recall")
    ds.eval_user_items = _user_sets(test)
    ds.valid_user_items = _user_sets(valid)
    return ds
