"""Dataset registry — rebuild of reference cogdl/datasets/__init__.py:82-223.

``build_dataset(name)`` returns a :class:`Dataset` holding one or more
statically shaped Graphs. Real datasets (planetoid, saint-npz, …) load from
``$COGDL_TPU_DATA`` (default ``~/.cogdl_tpu``) if files are present — there is
no network access in this environment, so downloads are replaced by clear
file-placement instructions. Synthetic stand-ins (``sbm``, ``powerlaw-*``)
are always available and are what tests/benchmarks use.
"""

from __future__ import annotations

import importlib
import os
import re
from typing import Any, Dict

from .dataset import Dataset

DATA_ROOT = os.environ.get("COGDL_TPU_DATA", os.path.expanduser("~/.cogdl_tpu"))

SUPPORTED_DATASETS: Dict[str, str] = {
    # planetoid (reference datasets/planetoid_data.py)
    "cora": "cogdl_tpu.datasets.planetoid.build",
    "citeseer": "cogdl_tpu.datasets.planetoid.build",
    "pubmed": "cogdl_tpu.datasets.planetoid.build",
    # ogb node (reference datasets/ogb.py) — npz-file based loader
    "ogbn-arxiv": "cogdl_tpu.datasets.ogb.build_node",
    "ogbn-products": "cogdl_tpu.datasets.ogb.build_node",
    "ogbn-proteins": "cogdl_tpu.datasets.ogb.build_node",
    # saint-format npz (reference datasets/saint_data.py)
    "flickr": "cogdl_tpu.datasets.saint.build",
    "reddit": "cogdl_tpu.datasets.saint.build",
    "yelp": "cogdl_tpu.datasets.saint.build",
    "ppi": "cogdl_tpu.datasets.saint.build",
    "amazon-s": "cogdl_tpu.datasets.saint.build",
    # KG triples (reference datasets/kg_data.py)
    "fb15k": "cogdl_tpu.datasets.kg.build",
    "fb15k237": "cogdl_tpu.datasets.kg.build",
    "wn18": "cogdl_tpu.datasets.kg.build",
    "wn18rr": "cogdl_tpu.datasets.kg.build",
    "fb13": "cogdl_tpu.datasets.kg.build",
    # TU graph classification (reference datasets/tu_data.py)
    "mutag": "cogdl_tpu.datasets.tu.build",
    "proteins": "cogdl_tpu.datasets.tu.build",
    "nci1": "cogdl_tpu.datasets.tu.build",
    "nci109": "cogdl_tpu.datasets.tu.build",
    "enzymes": "cogdl_tpu.datasets.tu.build",
    "imdb-b": "cogdl_tpu.datasets.tu.build",
    "imdb-m": "cogdl_tpu.datasets.tu.build",
    "collab": "cogdl_tpu.datasets.tu.build",
    "reddit-b": "cogdl_tpu.datasets.tu.build",
    "ptc-mr": "cogdl_tpu.datasets.tu.build",
    # matlab .mat embeddings benchmarks (reference datasets/matlab_matrix.py)
    "blogcatalog": "cogdl_tpu.datasets.matlab.build",
    "wikipedia": "cogdl_tpu.datasets.matlab.build",
    "ppi-ne": "cogdl_tpu.datasets.matlab.build",
    "dblp-ne": "cogdl_tpu.datasets.matlab.build",
}


def build_dataset(name: str, **kwargs) -> Dataset:
    """Resolve a dataset by name: registry entries, synthetic families
    (``sbm``, ``sbm-large``, ``powerlaw-<N>``, ``random-graphs``,
    ``random-kg``), or raise with known names."""
    from . import synthetic as syn

    if name == "sbm" or name == "sbm-small":
        return Dataset.from_graph(syn.sbm_graph(**kwargs), name=name)
    if name == "sbm-large":
        kwargs.setdefault("num_nodes", 4000)
        kwargs.setdefault("p_in", 0.02)
        kwargs.setdefault("p_out", 0.002)
        return Dataset.from_graph(syn.sbm_graph(**kwargs), name=name)
    m = re.fullmatch(r"powerlaw-(\d+)([km]?)", name)
    if m:
        n = int(m.group(1)) * {"": 1, "k": 1000, "m": 1000000}[m.group(2)]
        return Dataset.from_graph(syn.powerlaw_graph(n, **kwargs), name=name)
    if name == "random-graphs":
        graphs, labels = syn.random_graphs_dataset(**kwargs)
        return Dataset.from_graphs(graphs, labels=labels, name=name)
    if name == "traffic-synthetic":
        return Dataset.from_graph(syn.traffic_graph(**kwargs), name=name,
                                  metric="mae")
    if name == "hetero-sbm":
        return Dataset.from_graph(syn.hetero_sbm_graph(**kwargs), name=name)
    if name == "rec-synthetic":
        return Dataset.from_graph(syn.bipartite_rec_graph(**kwargs), name=name)
    if name == "random-kg":
        return Dataset.from_triples(syn.random_triples(**kwargs), name=name)

    try:
        path = SUPPORTED_DATASETS[name]
    except KeyError:
        raise ValueError(
            f"unknown dataset {name!r}; registry: {sorted(SUPPORTED_DATASETS)}, "
            "synthetic: sbm | sbm-large | powerlaw-<N>[k|m] | random-graphs | random-kg"
        ) from None
    module_path, fn_name = path.rsplit(".", 1)
    fn = getattr(importlib.import_module(module_path), fn_name)
    return fn(name, root=os.path.join(DATA_ROOT, name), **kwargs)
