"""Dataset container — rebuild of reference cogdl/data/dataset.py:24,175.

Holds one Graph (node-level tasks), a list of Graphs + labels (graph-level
tasks), or a KG triple dict. Carries default loss/evaluator metadata like the
reference's ``get_default_loss_fn/evaluator`` hooks (dataset.py:130-134).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional

import numpy as np

from ..data.graph import Graph


@dataclass
class Dataset:
    name: str = "dataset"
    graph: Optional[Graph] = None
    graphs: Optional[List[Graph]] = None
    labels: Optional[np.ndarray] = None
    triples: Optional[Dict[str, Any]] = None
    metric: str = "accuracy"

    @classmethod
    def from_graph(cls, graph: Graph, name: str = "dataset", metric: str = "accuracy"):
        return cls(name=name, graph=graph, metric=metric)

    @classmethod
    def from_graphs(cls, graphs: List[Graph], labels=None, name: str = "dataset"):
        return cls(name=name, graphs=graphs, labels=labels)

    @classmethod
    def from_triples(cls, triples: Dict[str, Any], name: str = "dataset"):
        return cls(name=name, triples=triples, metric="mrr")

    @property
    def num_features(self) -> int:
        if self.graph is None and self.graphs is None:
            return 0    # triples-only datasets: no node features
        g = self.graph if self.graph is not None else self.graphs[0]
        return 0 if g.x is None else g.num_features

    @property
    def num_classes(self) -> int:
        if self.graph is None and self.graphs is None:
            return None  # triples-only datasets: no labels
        g = self.graph if self.graph is not None else self.graphs[0]
        nc = g.num_classes
        if nc is None and g.y is not None:
            y = np.asarray(g.y)
            nc = int(y.max()) + 1 if y.ndim == 1 else y.shape[1]
        if nc is None and self.labels is not None:
            nc = int(np.max(self.labels)) + 1
        return nc

    def __len__(self):
        if self.graphs is not None:
            return len(self.graphs)
        return 1

    def __repr__(self):
        if self.graphs is not None:
            return f"Dataset({self.name}, {len(self.graphs)} graphs)"
        if self.triples is not None:
            return f"Dataset({self.name}, KG triples)"
        return f"Dataset({self.name}, {self.graph})"
