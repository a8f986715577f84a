"""PeMS traffic datasets (reference cogdl/datasets/stgcn_data.py and
stgat_data.py): pems-stgcn / pems-stgat.

Raw layout under ``<root>/raw`` (the reference's preprocessed output —
stgcn_data.py:139-141):
  V_<n>.csv   T rows × (timestamp + n station speed columns)
  W_<n>.csv   n × n weighted adjacency (gaussian-kernel distances)

Produces the framework's traffic Graph contract (same as
synthetic.traffic_graph): road graph from W plus ``extras['series']``
[T, n_pad, 1]; TrafficPredictionWrapper windows it (MAE/MAPE/RMSE).
"""

from __future__ import annotations

import os

import numpy as np

from ..data.graph import from_coo
from .dataset import Dataset


def _read_csv(path, skip_first_col=False):
    rows = []
    with open(path) as f:
        header = f.readline()
        ncol = len(header.rstrip("\n").split(","))
        for line in f:
            vals = line.rstrip("\n").split(",")
            if skip_first_col:
                vals = vals[1:]
            rows.append([float(v) if v else 0.0 for v in vals])
    return np.asarray(rows, np.float32), ncol


def build(name: str, root: str, num_stations: int = 228, **kwargs) -> Dataset:
    import jax.numpy as jnp

    raw = os.path.join(root, "raw")
    v_path = os.path.join(raw, f"V_{num_stations}.csv")
    w_path = os.path.join(raw, f"W_{num_stations}.csv")
    missing = [p for p in (v_path, w_path) if not os.path.exists(p)]
    if missing:
        raise FileNotFoundError(
            f"pems dataset {name!r}: place V_{num_stations}.csv and "
            f"W_{num_stations}.csv under {raw}. Missing: {missing}")
    series, _ = _read_csv(v_path, skip_first_col=True)  # drop timestamp col
    W, _ = _read_csv(w_path)
    N = W.shape[0]
    if series.shape[1] != N:
        raise ValueError(
            f"V has {series.shape[1]} stations but W is {W.shape}")
    src, dst = np.nonzero(W)
    g = from_coo(np.stack([dst.astype(np.int64), src.astype(np.int64)]),
                 num_nodes=N, edge_weight=W[src, dst].astype(np.float32),
                 meta={"name": name, "num_classes": 1})
    # z-score the series like the reference's StandardScaler (stgcn_data.py)
    mean, std = series.mean(), series.std() + 1e-8
    series = ((series - mean) / std)[..., None]
    pad = np.zeros((series.shape[0], g.n_pad - N, 1), np.float32)
    series = np.concatenate([series, pad], axis=1)
    x = np.zeros((g.n_pad, 1), np.float32)
    g = g.replace(x=jnp.asarray(x),
                  extras={"series": jnp.asarray(series)})
    ds = Dataset.from_graph(g, name=name, metric="mae")
    ds.series_scale = (float(mean), float(std))
    return ds
