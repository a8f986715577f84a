"""TU-format graph-classification loader (reference cogdl/datasets/tu_data.py:
MUTAG/PROTEINS/NCI1/...): <name>_A.txt, <name>_graph_indicator.txt,
<name>_graph_labels.txt, optional node labels/attributes."""

from __future__ import annotations

import os
from typing import List

import numpy as np

from ..data.graph import Graph, from_coo
from .dataset import Dataset


# registry short name → canonical TU Dortmund archive name (the upstream
# zips at chrsmrrs.com/graphkerneldatasets unpack <CANON>/<CANON>_*.txt)
CANONICAL = {
    "imdb-b": "IMDB-BINARY", "imdb-m": "IMDB-MULTI",
    "reddit-b": "REDDIT-BINARY", "reddit-multi-5k": "REDDIT-MULTI-5K",
    "reddit-multi-12k": "REDDIT-MULTI-12K", "ptc-mr": "PTC_MR",
}


def build(name: str, root: str, **kwargs) -> Dataset:
    raw = os.path.join(root, "raw")
    canon = CANONICAL.get(name, name.upper())
    # accept flat files (raw/<NAME>_A.txt) or the upstream zip layout
    # (raw/<CANON>/<CANON>_A.txt)
    bases = [os.path.join(raw, name.upper()), os.path.join(raw, canon),
             os.path.join(raw, canon, canon)]
    base = next((b for b in bases if os.path.exists(f"{b}_A.txt")), bases[0])
    need = [f"{base}_A.txt", f"{base}_graph_indicator.txt",
            f"{base}_graph_labels.txt"]
    missing = [p for p in need if not os.path.exists(p)]
    if missing:
        raise FileNotFoundError(
            f"TU dataset {name!r}: place the TUDataset files under {raw} "
            f"(missing {[os.path.basename(p) for p in missing]}). For "
            "offline testing use dataset='random-graphs'.")
    edges = np.loadtxt(need[0], delimiter=",", dtype=np.int64) - 1  # 1-based
    indicator = np.loadtxt(need[1], dtype=np.int64) - 1
    glabels = np.loadtxt(need[2], dtype=np.int64)
    glabels = glabels - glabels.min()
    node_label_path = f"{base}_node_labels.txt"
    node_labels = (np.loadtxt(node_label_path, dtype=np.int64)
                   if os.path.exists(node_label_path) else None)

    num_graphs = int(indicator.max()) + 1
    offsets = np.zeros(num_graphs + 1, np.int64)
    np.cumsum(np.bincount(indicator, minlength=num_graphs), out=offsets[1:])
    edge_graph = indicator[edges[:, 0]]

    graphs: List[Graph] = []
    if node_labels is not None:
        n_nl = int(node_labels.max()) + 1
    for gi in range(num_graphs):
        sel = edge_graph == gi
        e = edges[sel] - offsets[gi]
        n = int(offsets[gi + 1] - offsets[gi])
        if node_labels is not None:
            xl = node_labels[offsets[gi]: offsets[gi + 1]]
            x = np.eye(n_nl, dtype=np.float32)[xl]
        else:
            # degree-as-feature (reference wrapper_utils degree features)
            deg = np.bincount(e[:, 0], minlength=n).astype(np.float32)
            x = deg[:, None]
        graphs.append(from_coo(e.T, num_nodes=n,
                               x=x, meta={"num_classes": int(glabels.max()) + 1}))
    return Dataset.from_graphs(graphs, labels=glabels.astype(np.int32),
                               name=name)
