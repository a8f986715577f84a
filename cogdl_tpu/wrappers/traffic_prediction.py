"""Traffic prediction wrapper — rebuild of reference stgcn_mw/stgat_mw
(cogdl/wrappers/*/traffic_prediction): sliding-window tensors, MAE/MAPE/RMSE
metrics over forecast horizons."""

from __future__ import annotations

from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np

from ..data.graph import Graph


class TrafficPredictionWrapper:
    eval_metric = "val_mae"
    eval_mode = "min"
    jit_eval = False

    def __init__(self, model, dataset=None, window: int = 12, horizon: int = 3,
                 batch_size: int = 16, seed: int = 0):
        self.model = model
        self.dataset = dataset
        self.window = window
        self.horizon = horizon
        self.batch_size = batch_size
        self.seed = seed

    def prepare_graph(self, graph: Graph) -> Graph:
        series = np.asarray(graph.extras["series"])  # [T, N, C]
        T = series.shape[0]
        W, H = self.window, self.horizon
        xs, ys = [], []
        for t in range(T - W - H + 1):
            xs.append(series[t: t + W])
            ys.append(series[t + W + H - 1])
        X = np.stack(xs)          # [S, W, N, C]
        Y = np.stack(ys)          # [S, N, C]
        n = X.shape[0]
        n_tr, n_va = int(0.7 * n), int(0.15 * n)
        self._splits = {
            "train": (X[:n_tr], Y[:n_tr]),
            "val": (X[n_tr: n_tr + n_va], Y[n_tr: n_tr + n_va]),
            "test": (X[n_tr + n_va:], Y[n_tr + n_va:]),
        }
        self._rng = np.random.default_rng(self.seed)
        return graph

    def train_batches(self, graph) -> List:
        X, Y = self._splits["train"]
        idx = self._rng.permutation(X.shape[0])
        B = self.batch_size
        out = []
        for s in range(0, len(idx) - B + 1, B):
            sl = idx[s: s + B]
            out.append((graph, jnp.asarray(X[sl]), jnp.asarray(Y[sl])))
        return out or [(graph, jnp.asarray(X[:B]), jnp.asarray(Y[:B]))]

    def init(self, rng, graph: Graph):
        X, _ = self._splits["train"]
        dummy = jnp.asarray(X[: self.batch_size])
        return self.model.init({"params": rng, "dropout": rng}, graph, dummy,
                               training=False)

    def loss(self, variables, batch, rng, training: bool = True):
        graph, x, y = batch
        mutable = ["batch_stats"] if "batch_stats" in variables else False
        out = self.model.apply(variables, graph, x, training=training,
                               rngs={"dropout": rng}, mutable=mutable)
        pred, updates = out if mutable else (out, {})
        node_m = graph.node_mask().astype(pred.dtype)[None, :, None]
        err = (pred - y) ** 2 * node_m
        return jnp.sum(err) / jnp.maximum(jnp.sum(
            jnp.broadcast_to(node_m, err.shape)), 1.0), updates

    def evaluate(self, variables, graph: Graph) -> Dict[str, float]:
        out = {}
        B = self.batch_size
        for split in ("val", "test"):
            X, Y = self._splits[split]
            abs_err, sq_err, cnt = 0.0, 0.0, 0.0
            for s in range(0, X.shape[0] - B + 1, B):
                x = jnp.asarray(X[s: s + B])
                y = Y[s: s + B]
                pred = np.asarray(self.model.apply(
                    variables, graph, x, training=False))
                m = np.asarray(graph.node_mask())[None, :, None]
                abs_err += float(np.sum(np.abs(pred - y) * m))
                sq_err += float(np.sum(((pred - y) * m) ** 2))
                cnt += float(np.sum(np.broadcast_to(m, y.shape)))
            out[f"{split}_mae"] = abs_err / max(cnt, 1.0)
            out[f"{split}_rmse"] = (sq_err / max(cnt, 1.0)) ** 0.5
        return out
