"""GCC pretraining wrapper — rebuild of the reference's GCC pipeline:

  * data side (cogdl/wrappers/data_wrapper/pretraining/gcc_dw.py:22):
    random-walk-with-restart subgraph PAIRS per seed node, eigenvector
    positional embeddings (gcc_dw.py:196 ``eigen_decomposision``,
    :220 ``_add_undirected_graph_positional_embedding``), seed indicator
    (gcc_dw.py:254);
  * model side (cogdl/wrappers/model_wrapper/pretraining/gcc_mw.py:20):
    MoCo contrastive training with a momentum key encoder and a fixed-size
    negative queue (wrappers/tools/memory_moco.py:7 ``MemoryMoCo``), and a
    frozen linear-probe evaluation (``freeze`` mode).

TPU-first redesign:
  * subgraph pairs are sampled host-side (native C++ RWR walker,
    cogdl_tpu/native/graph_sampler.cpp) and union-batched into ONE static
    graph per step — [q_0..q_B-1 | k_0..k_B-1] with ``graph_id`` readout;
  * the MoCo queue and the EMA key-encoder parameters ride the Trainer's
    ``model_state`` pytree and are updated INSIDE the jitted step (ring
    buffer via ``dynamic_update_slice``) — no host-side mutation, exactly
    the BGRL-teacher pattern;
  * eigen positional embeddings use dense ``numpy.linalg.eigh`` (subgraphs
    are ≤ subgraph_size ≤ 128 nodes — ARPACK is pointless at that size);
  * degree enters as one normalised column instead of a one-hot table
    (static width regardless of max degree).
"""

from __future__ import annotations

from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np

from ..data.batch import union_batch
from ..data.graph import Graph, from_coo


def _eigen_pe(row: np.ndarray, col: np.ndarray, n: int, k: int,
              size: int) -> np.ndarray:
    """Top-k eigenvectors of the normalised adjacency (== smallest of the
    normalised Laplacian), L2-normalised rows, zero-padded to ``size``
    (reference gcc_dw.py:196-217)."""
    k = min(k, max(n - 2, 1), size)
    a = np.zeros((n, n), np.float64)
    a[row, col] = 1.0
    a[col, row] = 1.0
    deg = a.sum(1)
    inv = np.where(deg > 0, 1.0 / np.sqrt(np.maximum(deg, 1e-12)), 0.0)
    norm_a = a * inv[:, None] * inv[None, :]
    try:
        vals, vecs = np.linalg.eigh(norm_a)
        u = vecs[:, -k:]                      # largest eigenvalues
    except np.linalg.LinAlgError:             # pragma: no cover
        u = np.zeros((n, k))
    u = u / np.maximum(np.linalg.norm(u, axis=1, keepdims=True), 1e-12)
    out = np.zeros((n, size), np.float32)
    out[:, :u.shape[1]] = u
    return out


class GCCWrapper:
    """MoCo-style contrastive pretraining over RWR subgraph pairs."""

    eval_metric = "val_acc"
    eval_mode = "max"
    jit_eval = False
    refresh_per_epoch = True        # new subgraph pairs every epoch

    def __init__(self, model, dataset=None, batch_size: int = 32,
                 rw_hops: int = 64, subgraph_size: int = 32,
                 restart_prob: float = 0.8,
                 positional_embedding_size: int = 16,
                 queue_size: int = 512, momentum: float = 0.999,
                 temperature: float = 0.07, batches_per_epoch: int = 4,
                 probe_nodes: int = 512, seed: int = 0):
        self.batch_size = batch_size
        self.rw_hops = rw_hops
        self.subgraph_size = subgraph_size
        self.restart_prob = restart_prob
        self.pe_size = positional_embedding_size
        self.queue_size = (max(queue_size, batch_size)
                           // batch_size) * batch_size
        self.momentum = momentum
        self.temperature = temperature
        self.batches_per_epoch = batches_per_epoch
        self.probe_nodes = probe_nodes
        self.seed = seed
        self._epoch = 0
        in_feats = positional_embedding_size + 2   # pe | seed flag | degree
        self.model = (model.clone(in_features=in_feats)
                      if hasattr(model, "in_features") else model)
        self.out_dim = getattr(self.model, "out_features", 64)

    # -- sampling -------------------------------------------------------
    def prepare_graph(self, graph: Graph) -> Graph:
        from ..data.sampling import graph_csr

        self._graph = graph
        self._csr = graph_csr(graph)
        return graph

    def _rwr_nodes(self, seeds: np.ndarray, seed: int) -> List[np.ndarray]:
        """One node set per seed from an RWR trace (unique, seed first,
        capped at subgraph_size)."""
        indptr, indices = self._csr[0], self._csr[1]
        from .. import native

        if native.available():
            traces = native.random_walk(indptr, indices, seeds,
                                        self.rw_hops,
                                        restart_prob=self.restart_prob,
                                        seed=seed)
        else:                                   # numpy fallback RWR
            rng = np.random.default_rng(seed)
            traces = np.empty((len(seeds), self.rw_hops), np.int64)
            for i, s in enumerate(seeds):
                cur = s
                for j in range(self.rw_hops):
                    traces[i, j] = cur
                    if rng.random() < self.restart_prob:
                        cur = s
                        continue
                    lo, hi = indptr[cur], indptr[cur + 1]
                    cur = (indices[lo + rng.integers(hi - lo)]
                           if hi > lo else s)
        out = []
        for s, tr in zip(seeds, traces):
            uniq = np.unique(tr)
            uniq = uniq[uniq != s][: self.subgraph_size - 1]
            out.append(np.concatenate([[s], uniq]))
        return out

    def _subgraph(self, nodes: np.ndarray) -> Graph:
        from .. import native

        indptr, indices = self._csr[0], self._csr[1]
        n = len(nodes)
        order = np.argsort(nodes, kind="stable")
        snodes = nodes[order]
        if native.available():
            row, col = native.induced_subgraph(indptr, indices, snodes,
                                               self._graph.n_pad)
            inv = np.empty(n, np.int64)
            inv[order] = np.arange(n)
            # native returns LOCAL ids over sorted(nodes); remap so the seed
            # (nodes[0]) is local node 0
            row, col = inv[row], inv[col]
        else:
            lut = -np.ones(self._graph.n_pad, np.int64)
            lut[nodes] = np.arange(n)
            E = self._graph.num_edges
            grow = np.asarray(self._graph.row)[:E]
            gcol = np.asarray(self._graph.col)[:E]
            m = (lut[grow] >= 0) & (lut[gcol] >= 0)
            row, col = lut[grow[m]], lut[gcol[m]]
        pe = _eigen_pe(row, col, n, self.pe_size, self.pe_size)
        deg = np.bincount(np.asarray(row), minlength=n).astype(np.float32)
        x = np.concatenate(
            [pe,
             np.eye(1, n, 0, np.float32).T,                  # seed flag
             (deg / max(deg.max(), 1.0))[:, None]], axis=1)
        if len(row) == 0:       # isolated seed: keep a self-loop
            row = col = np.zeros(1, np.int64)
        return from_coo(np.stack([row, col]), num_nodes=n, x=x,
                        bucket=False)

    def train_batches(self, graph: Graph) -> List[Graph]:
        rng = np.random.default_rng(self.seed + 1000 * self._epoch)
        self._epoch += 1
        batches = []
        for b in range(self.batches_per_epoch):
            seeds = rng.integers(0, graph.num_nodes, self.batch_size)
            q_nodes = self._rwr_nodes(seeds, int(rng.integers(1 << 30)))
            k_nodes = self._rwr_nodes(seeds, int(rng.integers(1 << 30)))
            subs = [self._subgraph(nd) for nd in q_nodes + k_nodes]
            batches.append(self._union(subs))
        return batches

    def _union(self, subs: List[Graph]) -> Graph:
        B2 = 2 * self.batch_size
        n_pad = B2 * self.subgraph_size + 8
        e_cap = sum(g.num_edges for g in subs)
        e_pad = max(1024, 1 << int(np.ceil(np.log2(max(e_cap, 1)))))
        return union_batch(subs, n_pad=n_pad, e_pad=e_pad,
                           num_graphs_pad=B2 + 1)

    # -- MoCo ------------------------------------------------------------
    def init(self, rng, graph: Graph):
        batch = self.train_batches(graph)[0]
        self._epoch = 0
        variables = dict(self.model.init(
            {"params": rng, "dropout": rng}, batch, batch.x, training=False))
        q0 = jax.random.normal(rng, (self.queue_size, self.out_dim))
        q0 = q0 / jnp.linalg.norm(q0, axis=1, keepdims=True)
        variables["moco"] = {
            "key_params": jax.tree.map(jnp.array, variables["params"]),
            "queue": q0,
            "ptr": jnp.zeros((), jnp.int32),
        }
        return variables

    def loss(self, variables, batch: Graph, rng, training: bool = True):
        B = self.batch_size
        moco = variables["moco"]
        has_bn = "batch_stats" in variables
        svars = {"params": variables["params"]}
        if has_bn:
            svars["batch_stats"] = variables["batch_stats"]
        out_q = self.model.apply(svars, batch, batch.x, training=training,
                                 rngs={"dropout": rng},
                                 mutable=["batch_stats"] if has_bn else False)
        bn_updates = {}
        if has_bn:
            out_q, upd = out_q
            bn_updates["batch_stats"] = upd["batch_stats"]
        kvars = {"params": moco["key_params"]}
        if has_bn:
            kvars["batch_stats"] = variables["batch_stats"]
        out_k = self.model.apply(kvars, batch, batch.x, training=False)
        q = out_q[:B]
        k = jax.lax.stop_gradient(out_k[B: 2 * B])
        l_pos = jnp.sum(q * k, axis=1, keepdims=True)            # [B, 1]
        l_neg = q @ moco["queue"].T                              # [B, K]
        logits = jnp.concatenate([l_pos, l_neg], 1) / self.temperature
        loss = jnp.mean(jax.nn.logsumexp(logits, 1) - logits[:, 0])

        # ring-buffer enqueue + EMA key encoder — inside the jitted step
        queue = jax.lax.dynamic_update_slice(
            moco["queue"], k, (moco["ptr"], jnp.int32(0)))
        ptr = (moco["ptr"] + B) % self.queue_size
        key_params = jax.tree.map(
            lambda kp, p: kp * self.momentum + (1 - self.momentum)
            * jax.lax.stop_gradient(p),
            moco["key_params"], variables["params"])
        return loss, {"moco": {"key_params": key_params, "queue": queue,
                               "ptr": ptr}, **bn_updates}

    # -- frozen linear probe (gcc_mw "freeze" mode) -----------------------
    def evaluate(self, variables, graph: Graph) -> Dict[str, float]:
        if graph.y is None:
            return {"val_acc": 0.0, "test_acc": 0.0}
        rng = np.random.default_rng(self.seed)
        n = graph.num_nodes
        nodes = (np.arange(n) if n <= self.probe_nodes
                 else rng.choice(n, self.probe_nodes, replace=False))
        embs = np.zeros((graph.n_pad, self.out_dim), np.float32)
        B = self.batch_size
        params = {k: variables[k] for k in ("params", "batch_stats")
                  if k in variables}
        for i in range(0, len(nodes), 2 * B):
            chunk = nodes[i: i + 2 * B]
            pad = 2 * B - len(chunk)
            seeds = np.concatenate([chunk, np.zeros(pad, np.int64)])
            node_sets = self._rwr_nodes(seeds, int(rng.integers(1 << 30)))
            batch = self._union([self._subgraph(nd) for nd in node_sets])
            out = np.asarray(self.model.apply(params, batch, batch.x,
                                              training=False))
            embs[chunk] = out[: len(chunk)]
        from ..utils.probe import logreg_probe

        sub = graph
        if len(nodes) < n:      # restrict the probe to embedded nodes
            keep = np.zeros(graph.n_pad, bool)
            keep[nodes] = True
            sub = graph.replace(
                train_mask=jnp.asarray(np.asarray(graph.train_mask) & keep),
                val_mask=jnp.asarray(np.asarray(graph.val_mask) & keep),
                test_mask=jnp.asarray(np.asarray(graph.test_mask) & keep))
        return logreg_probe(embs, sub)
