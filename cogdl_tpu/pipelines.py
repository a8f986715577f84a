"""Pipelines — inference/application API, rebuild of reference
cogdl/pipelines.py:277 SUPPORTED_APPS: dataset stats, embedding generation,
recommendation top-k (OAGBert pipeline lives with the oag subpackage)."""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence, Union

import numpy as np

from .datasets import build_dataset
from .datasets.dataset import Dataset


class Pipeline:
    def __init__(self, app: str, **kwargs):
        self.app = app
        self.kwargs = kwargs

    def __call__(self, *args, **kw):
        raise NotImplementedError


class DatasetStatsPipeline(Pipeline):
    """reference DatasetStatsPipeline (pipelines.py:40): tabulated node/edge/
    feature/class counts per dataset."""

    def __call__(self, datasets: Union[str, Sequence[str], None] = None, **kw):
        datasets = datasets or self.kwargs.get("dataset", "sbm")
        if isinstance(datasets, str):
            datasets = [datasets]
        rows = []
        for name in datasets:
            ds = build_dataset(name) if isinstance(name, str) else name
            if ds.graph is not None:
                g = ds.graph
                rows.append({
                    "dataset": ds.name, "nodes": g.num_nodes,
                    "edges": g.num_edges,
                    "features": 0 if g.x is None else g.num_features,
                    "classes": ds.num_classes,
                })
            elif ds.graphs is not None:
                rows.append({
                    "dataset": ds.name, "graphs": len(ds.graphs),
                    "avg_nodes": float(np.mean([g.num_nodes for g in ds.graphs])),
                    "avg_edges": float(np.mean([g.num_edges for g in ds.graphs])),
                })
        for r in rows:
            print("  ".join(f"{k}={v}" for k, v in r.items()))
        return rows


class GenerateEmbeddingPipeline(Pipeline):
    """reference GenerateEmbeddingPipeline (pipelines.py:140): run a shallow
    embedding model on an edge list / dataset and return the matrix."""

    def __call__(self, edge_index=None, dataset=None, model: str = "prone",
                 **model_kwargs):
        from .data.graph import from_coo
        from .models import build_model

        model = self.kwargs.get("model", model)
        model_kwargs = {**self.kwargs.get("model_kwargs", {}), **model_kwargs}
        if dataset is not None:
            ds = build_dataset(dataset) if isinstance(dataset, str) else dataset
            graph = ds.graph
        else:
            graph = from_coo(np.asarray(edge_index))
        m = build_model(model, **model_kwargs)
        return m.train_embeddings(graph)


class RecommendationPipeline(Pipeline):
    """reference RecommendationPipepline (pipelines.py:211): train LightGCN on
    a user-item graph, answer top-k queries."""

    def __call__(self, dataset="rec-synthetic", topk: int = 10, epochs: int = 30,
                 **kw):
        import jax

        from .models import build_model
        from .wrappers.recommendation import RecommendationWrapper
        from .trainer.trainer import Trainer, TrainerConfig

        ds = build_dataset(dataset) if isinstance(dataset, str) else dataset
        model = build_model("lightgcn", hidden_size=kw.get("hidden_size", 64),
                            num_layers=kw.get("num_layers", 2))
        w = RecommendationWrapper(model, ds)
        res = Trainer(TrainerConfig(epochs=epochs, weight_decay=0.0)).run(
            w, ds.graph)
        variables = res.pop("_variables")
        num_users = ds.graph.meta_get("num_users")

        def recommend(users: Sequence[int]) -> np.ndarray:
            emb = np.asarray(model.apply(variables, ds.graph))
            u = emb[np.asarray(users)]
            items = emb[num_users: ds.graph.num_nodes]
            scores = u @ items.T
            return np.argsort(-scores, axis=1)[:, :topk] + num_users

        recommend.metrics = res
        return recommend


class DatasetVisualPipeline(Pipeline):
    """reference DatasetVisualPipeline (pipelines.py:75): BFS ego-network of
    ``depth`` hops around ``seed``, colored by hop distance, saved to
    ``<name>.png``. Returns the outermost BFS frontier like the reference."""

    def __call__(self, dataset: Union[str, Dataset, None] = None,
                 seed: int = -1, depth: int = 3, out_file: str = None, **kw):
        dataset = dataset or self.kwargs.get("dataset", "sbm")
        ds = build_dataset(dataset) if isinstance(dataset, str) else dataset
        g = ds.graph
        E = g.num_edges
        row = np.asarray(g.row)[:E]
        col = np.asarray(g.col)[:E]
        neighbors: Dict[int, set] = {}
        for r, c in zip(row, col):
            neighbors.setdefault(int(r), set()).add(int(c))
            neighbors.setdefault(int(c), set()).add(int(r))
        rng = np.random.default_rng(0)
        if seed == -1:
            seed = int(rng.choice(sorted(neighbors)))
        q = [seed]
        hop = {seed: 0}
        for _ in range(depth):
            nq = []
            for u in q:
                for v in neighbors.get(u, ()):
                    if v not in hop:
                        hop[v] = hop[u] + 1
                        nq.append(v)
            q = nq
        try:
            import matplotlib

            matplotlib.use("Agg")
            import matplotlib.cm as cm
            import matplotlib.pyplot as plt

            max_hop = max(hop.values()) + 1
            cmap = cm.rainbow(np.linspace(0.0, 1.0, max_hop))
            # radial layout: hop ring + angular spread
            plt.figure(figsize=(6, 6))
            by_hop: Dict[int, List[int]] = {}
            for n, h in hop.items():
                by_hop.setdefault(h, []).append(n)
            pos = {}
            for h, nodes in by_hop.items():
                ang = np.linspace(0, 2 * np.pi, len(nodes), endpoint=False)
                ang += rng.uniform(0, 2 * np.pi)
                for a, n in zip(ang, nodes):
                    pos[n] = (h * np.cos(a), h * np.sin(a))
            for u in hop:
                for v in neighbors.get(u, ()):
                    if v in hop:
                        plt.plot([pos[u][0], pos[v][0]],
                                 [pos[u][1], pos[v][1]],
                                 color="0.8", lw=0.5, zorder=1)
            for h, nodes in by_hop.items():
                xs = [pos[n][0] for n in nodes]
                ys = [pos[n][1] for n in nodes]
                plt.scatter(xs, ys, s=(max_hop - h) * 50, color=cmap[h],
                            zorder=2, label=f"hop {h}")
            plt.legend()
            plt.axis("off")
            out_file = out_file or f"{ds.name}.png"
            plt.savefig(out_file)
            plt.close()
            print(f"Sampled ego network saved to {out_file}")
        except ImportError:
            print("matplotlib unavailable; returning BFS frontier only")
        return q


SUPPORTED_APPS = {
    "stats": DatasetStatsPipeline,
    "dataset-stats": DatasetStatsPipeline,
    "dataset-visual": DatasetVisualPipeline,
    "generate-emb": GenerateEmbeddingPipeline,
    "recommendation": RecommendationPipeline,
    "oagbert": "cogdl_tpu.oag.oagbert.OAGBertInferencePipeline",
}


def pipeline(app: str, **kwargs) -> Pipeline:
    """reference ``pipeline(app)`` (pipelines.py:294)."""
    try:
        cls = SUPPORTED_APPS[app]
    except KeyError:
        raise ValueError(f"unknown app {app!r}; known: {sorted(SUPPORTED_APPS)}")
    if isinstance(cls, str):
        import importlib

        mod, name = cls.rsplit(".", 1)
        cls = getattr(importlib.import_module(mod), name)
    return cls(app, **kwargs)
