"""OGB node-property loader (reference cogdl/datasets/ogb.py wraps the ogb
package; here we parse the extracted standard layout directly so no ogb pip
dependency is needed):
  <root>/raw/edge_index.npy  (2, E)  [or edge.csv.gz from the ogb zip]
  <root>/raw/node_feat.npy   (N, F)
  <root>/raw/labels.npy      (N,) or (N, k)
  <root>/raw/split/{train,valid,test}.npy index arrays
If the ``ogb`` package IS importable, it is used as a convenience fallback."""

from __future__ import annotations

import os

import numpy as np

from ..data.graph import from_coo, to_undirected
from .dataset import Dataset


def _label_meta(y, name):
    """Multilabel OGB sets (ogbn-proteins: [N, 112] binary) need the class
    count from the label WIDTH and the multilabel flag/metric (mirrors
    saint.py's handling)."""
    if y.ndim == 2:
        return {"num_classes": int(y.shape[1]), "multilabel": True,
                "metric": "multilabel_f1", "name": name}
    return {"num_classes": int(y.max()) + 1, "name": name}


def build_node(name: str, root: str, **kwargs) -> Dataset:
    raw = os.path.join(root, "raw")
    npys = ["edge_index.npy", "node_feat.npy", "labels.npy"]
    if all(os.path.exists(os.path.join(raw, f)) for f in npys):
        ei = np.load(os.path.join(raw, "edge_index.npy"))
        x = np.load(os.path.join(raw, "node_feat.npy")).astype(np.float32)
        y = np.load(os.path.join(raw, "labels.npy")).squeeze()
        N = x.shape[0]
        masks = {}
        for split in ("train", "valid", "test"):
            p = os.path.join(raw, "split", f"{split}.npy")
            m = np.zeros(N, bool)
            if os.path.exists(p):
                m[np.load(p)] = True
            masks[split] = m
        g = from_coo(ei, num_nodes=N, x=x, y=y.astype(np.int32),
                     train_mask=masks["train"], val_mask=masks["valid"],
                     test_mask=masks["test"],
                     meta=_label_meta(y, name))
        return Dataset.from_graph(to_undirected(g), name=name)
    try:
        from ogb.nodeproppred import NodePropPredDataset
    except ImportError:
        raise FileNotFoundError(
            f"OGB dataset {name!r}: place edge_index.npy / node_feat.npy / "
            f"labels.npy / split/*.npy under {raw}, or install the ogb "
            "package with its download cache.")
    d = NodePropPredDataset(name, root=root)
    graph, labels = d[0]
    split = d.get_idx_split()
    N = graph["num_nodes"]
    masks = {}
    for k in ("train", "valid", "test"):
        m = np.zeros(N, bool)
        m[split[k]] = True
        masks[k] = m
    y = labels.squeeze()
    g = from_coo(graph["edge_index"], num_nodes=N,
                 x=graph["node_feat"].astype(np.float32),
                 y=y.astype(np.int32),
                 train_mask=masks["train"], val_mask=masks["valid"],
                 test_mask=masks["test"],
                 meta=_label_meta(y, name))
    return Dataset.from_graph(to_undirected(g), name=name)
