"""GATNE multiplex network datasets (reference cogdl/datasets/gatne.py):
amazon / twitter / youtube.

Raw layout under ``<root>/raw``:
  train.txt   "etype u v" per line
  valid.txt   "etype u v label"  (label 1 = positive, 0 = sampled negative)
  test.txt    same as valid

The Dataset's graph holds the train edges (undirected, typed via
``edge_type``); the official valid/test positive/negative pairs are carried
as ``Dataset.multiplex_eval`` = {etype: {"valid": (pos, neg), "test":
(pos, neg)}} with (2, E) int arrays, which MultiplexEmbeddingWrapper uses
instead of a random holdout.
"""

from __future__ import annotations

import os
from collections import defaultdict

import numpy as np

from ..data.graph import from_coo
from .dataset import Dataset


def build(name: str, root: str, **kwargs) -> Dataset:
    raw = os.path.join(root, "raw")
    needed = ["train.txt", "valid.txt", "test.txt"]
    missing = [f for f in needed if not os.path.exists(os.path.join(raw, f))]
    if missing:
        raise FileNotFoundError(
            f"gatne dataset {name!r}: place {needed} under {raw}. "
            f"Missing: {missing}")
    node2id = {}

    def nid(v):
        if v not in node2id:
            node2id[v] = len(node2id)
        return node2id[v]

    rows, cols, etypes = [], [], []
    type2id = {}
    with open(os.path.join(raw, "train.txt")) as f:
        for line in f:
            t, u, v = line.split()[:3]
            if t not in type2id:
                type2id[t] = len(type2id)
            u, v = nid(u), nid(v)
            rows += [u, v]
            cols += [v, u]
            etypes += [type2id[t]] * 2

    eval_pairs = {}
    for split in ("valid", "test"):
        per_type = defaultdict(lambda: ([], []))
        with open(os.path.join(raw, f"{split}.txt")) as f:
            for line in f:
                t, u, v, lab = line.split()[:4]
                if t not in type2id:
                    type2id[t] = len(type2id)
                bucket = per_type[type2id[t]][0 if int(lab) == 1 else 1]
                bucket.append((nid(u), nid(v)))
        eval_pairs[split] = {
            t: (np.asarray(pos, np.int64).reshape(-1, 2).T,
                np.asarray(neg, np.int64).reshape(-1, 2).T)
            for t, (pos, neg) in per_type.items()}

    N = len(node2id)
    g = from_coo(np.stack([np.asarray(rows, np.int64),
                           np.asarray(cols, np.int64)]),
                 num_nodes=N, edge_type=np.asarray(etypes, np.int32),
                 meta={"name": name, "num_relations": len(type2id)})
    ds = Dataset.from_graph(g, name=name, metric="auc")
    ds.multiplex_eval = {
        t: {split: eval_pairs[split].get(t, (np.zeros((2, 0), np.int64),) * 2)
            for split in ("valid", "test")}
        for t in range(len(type2id))}
    return ds
