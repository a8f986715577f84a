"""Self-supervised node wrappers: DGI and GRACE.

Rebuild of reference dgi_mw / grace_mw (cogdl/wrappers/model_wrapper/
node_classification/{dgi_mw,grace_mw}.py): train the encoder with the
self-supervised objective, then evaluate by logistic-regression probing of
frozen embeddings (wrapper_utils.evaluate_node_embeddings_using_logreg).
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from ..data.graph import Graph, add_self_loops
from ..utils.probe import logreg_probe
from .node_classification import NodeClfWrapper


class DGIWrapper:
    eval_metric = "val_acc"
    eval_mode = "max"
    jit_eval = False

    def __init__(self, model, dataset=None):
        self.model = model
        self.dataset = dataset

    def prepare_graph(self, graph: Graph) -> Graph:
        return add_self_loops(graph)

    def train_batches(self, graph):
        return [graph]

    def init(self, rng, graph: Graph):
        # init through the loss path so every submodule (encoder AND
        # discriminator) gets parameters
        return self.model.init({"params": rng, "dropout": rng}, graph, graph.x,
                               graph.x, False, method=self.model.infomax_logits)

    def loss(self, variables, graph: Graph, rng, training: bool = True):
        r1, r2 = jax.random.split(rng)
        # permute REAL nodes only: pad rows are all-zero, and shuffling them
        # in would hand the discriminator trivially separable negatives
        n = graph.num_nodes
        perm = jnp.concatenate([
            jax.random.permutation(r1, n),
            jnp.arange(n, graph.x.shape[0])])
        x_corrupt = graph.x[perm]
        pos, neg = self.model.apply(
            variables, graph, graph.x, x_corrupt, training,
            rngs={"dropout": r2}, method=self.model.infomax_logits)
        m = graph.node_mask().astype(pos.dtype)
        # BCE: positives → 1, negatives → 0
        def bce(logit, target):
            return jnp.maximum(logit, 0) - logit * target + jnp.log1p(
                jnp.exp(-jnp.abs(logit)))
        loss = jnp.sum((bce(pos, 1.0) + bce(neg, 0.0)) * m) / jnp.maximum(
            2 * m.sum(), 1.0)
        return loss, {}

    def evaluate(self, variables, graph: Graph) -> Dict[str, jnp.ndarray]:
        emb = self.model.apply(variables, graph, graph.x,
                               method=self.model.embed)
        return logreg_probe(np.asarray(emb), graph)


class GRACEWrapper(DGIWrapper):
    def init(self, rng, graph: Graph):
        def init_all(model):
            h = model.encode(graph, graph.x, False)
            return model.project(h)

        return self.model.init({"params": rng, "dropout": rng},
                               method=init_all)

    def loss(self, variables, graph: Graph, rng, training: bool = True):
        r1, r2, r3 = jax.random.split(rng, 3)
        z1 = self.model.apply(variables, graph, graph.x, r1, 0, training,
                              rngs={"dropout": r3}, method=self.model.view)
        z2 = self.model.apply(variables, graph, graph.x, r2, 1, training,
                              rngs={"dropout": r3}, method=self.model.view)
        h1 = self.model.apply(variables, z1, method=self.model.project)
        h2 = self.model.apply(variables, z2, method=self.model.project)
        mask = graph.node_mask()
        l1 = self.model.apply(variables, h1, h2, mask, method=self.model.nt_xent)
        l2 = self.model.apply(variables, h2, h1, mask, method=self.model.nt_xent)
        return 0.5 * (l1 + l2), {}

    def evaluate(self, variables, graph: Graph) -> Dict[str, jnp.ndarray]:
        emb = self.model.apply(variables, graph, graph.x, False,
                               method=self.model.encode)
        return logreg_probe(np.asarray(emb), graph)


class GraphMAEWrapper(DGIWrapper):
    """Masked-autoencoder pretraining + logreg probe (BASELINE.json config 5:
    GraphMAE self-supervised pretrain + linear probe)."""

    def init(self, rng, graph: Graph):
        return self.model.init(
            {"params": rng, "dropout": rng}, graph, graph.x, rng, False,
            method=self.model.reconstruction_loss)

    def loss(self, variables, graph: Graph, rng, training: bool = True):
        r1, r2 = jax.random.split(rng)
        loss = self.model.apply(variables, graph, graph.x, r1, training,
                                rngs={"dropout": r2},
                                method=self.model.reconstruction_loss)
        return loss, {}


class GraphMAE2Wrapper(GraphMAEWrapper):
    """GraphMAE2 (reference examples/graphmae2): masked reconstruction with
    multi-remask decoding + a latent loss against an EMA teacher
    (encoder+projector), teacher pytree in model_state like BGRL."""

    def __init__(self, model, dataset=None, ema_decay: float = 0.996):
        super().__init__(model, dataset)
        self.ema_decay = float(ema_decay)

    def init(self, rng, graph: Graph):
        variables = dict(self.model.init(
            {"params": rng, "dropout": rng}, graph, graph.x, rng,
            method=self.model.init_all))
        vp = variables["params"]
        variables["teacher"] = jax.tree.map(
            jnp.array, {"enc": vp["enc"], "proj": vp["proj"]})
        return variables

    def loss(self, variables, graph: Graph, rng, training: bool = True):
        r1, r2, rd = jax.random.split(rng, 3)
        svars = {"params": variables["params"]}
        m = self.model

        def run(fn, *args):
            return m.apply(svars, *args, rngs={"dropout": rd}, method=fn)

        x_masked, mask = run(m.mask_inputs, graph.x, graph.node_mask(), r1)
        enc_rep = run(m.encode, graph, x_masked, training)
        # latent loss on KEPT real nodes vs the EMA teacher on unmasked x
        latent_pred = run(m.student_latent, enc_rep)
        # setup declares the mask tokens eagerly, so the teacher variables
        # must carry them (unused by teacher_latent; gradients stopped)
        vp = variables["params"]
        tvars = {"params": {
            **variables["teacher"],
            "mask_token": jax.lax.stop_gradient(vp["mask_token"]),
            "dec_mask_token": jax.lax.stop_gradient(vp["dec_mask_token"]),
        }}
        latent_tgt = jax.lax.stop_gradient(m.apply(
            tvars, graph, graph.x, method=m.teacher_latent))
        from ..models.nn.graphmae2 import sce_loss

        keep = (graph.node_mask()[:, None] & ~mask).squeeze(-1).astype(
            jnp.float32)
        lat = jnp.sum(sce_loss(latent_pred, latent_tgt, 1.0) * keep) / (
            jnp.maximum(keep.sum(), 1.0))
        rec = run(m.remask_decode, graph, enc_rep, mask, r2, training)
        loss = rec + m.lam * lat

        beta = self.ema_decay
        new_teacher = jax.tree.map(
            lambda t, s: t * beta + (1 - beta) * jax.lax.stop_gradient(s),
            variables["teacher"],
            {"enc": variables["params"]["enc"],
             "proj": variables["params"]["proj"]})
        return loss, {"teacher": new_teacher}


class BGRLWrapper(DGIWrapper):
    """Bootstrapped (BYOL-style) pretraining: student+predictor chases an
    EMA teacher over two augmented views; no negatives (reference
    examples/bgrl/train.py). The teacher pytree (encoder params + BN stats)
    rides the Trainer's model_state and is EMA-updated in the jitted step
    with a cosine-annealed decay (models.py:27 EMA.update_average)."""

    def __init__(self, model, dataset=None, drop_edge_rates=(0.2, 0.3),
                 drop_feature_rates=(0.2, 0.3), ema_decay: float = 0.99,
                 ema_total_steps: int = 1000):
        super().__init__(model, dataset)
        self.drop_edge_rates = tuple(drop_edge_rates)
        self.drop_feature_rates = tuple(drop_feature_rates)
        self.ema_decay = float(ema_decay)
        self.ema_total_steps = int(ema_total_steps)

    def init(self, rng, graph: Graph):
        variables = self.model.init(
            {"params": rng, "dropout": rng}, graph, graph.x, True,
            method=self.model.student)
        variables = dict(variables)
        teacher = {"params": variables["params"]["enc"]}
        if "batch_stats" in variables:
            teacher["batch_stats"] = variables["batch_stats"]["enc"]
        variables["teacher"] = jax.tree.map(jnp.array, teacher)
        variables["ema"] = {"step": jnp.zeros((), jnp.float32)}
        return variables

    def _views(self, graph, rng):
        from ..utils.transforms import drop_edge, drop_feature

        rs = jax.random.split(rng, 4)
        out = []
        for i in range(2):
            g = drop_edge(graph, self.drop_edge_rates[i], rs[2 * i])
            x = drop_feature(graph.x, self.drop_feature_rates[i],
                             rs[2 * i + 1])
            out.append((g, x))
        return out

    def loss(self, variables, graph: Graph, rng, training: bool = True):
        rv, rd = jax.random.split(rng)
        (g1, x1), (g2, x2) = self._views(graph, rv)
        has_bn = "batch_stats" in variables
        svars = {"params": variables["params"]}
        if has_bn:
            svars["batch_stats"] = variables["batch_stats"]

        def student(sv, g, x):
            out = self.model.apply(
                sv, g, x, True, method=self.model.student,
                rngs={"dropout": rd}, mutable=["batch_stats"] if has_bn
                else False)
            return out if has_bn else (out, {})

        p1, upd1 = student(svars, g1, x1)
        if has_bn:
            svars = {**svars, **upd1}
        p2, upd2 = student(svars, g2, x2)

        tvars = {"params": {"enc": variables["teacher"]["params"]}}
        if has_bn:
            tvars["batch_stats"] = {
                "enc": variables["teacher"]["batch_stats"]}
        t1 = self.model.apply(tvars, g1, x1, False,
                              method=self.model.embed)
        t2 = self.model.apply(tvars, g2, x2, False,
                              method=self.model.embed)

        def cos_loss(p, t):
            t = jax.lax.stop_gradient(t)
            pn = p * jax.lax.rsqrt(jnp.maximum(
                jnp.sum(p * p, -1, keepdims=True), 1e-12))
            tn = t * jax.lax.rsqrt(jnp.maximum(
                jnp.sum(t * t, -1, keepdims=True), 1e-12))
            return 2.0 - 2.0 * jnp.sum(pn * tn, axis=-1)

        m = graph.node_mask().astype(p1.dtype)
        loss = jnp.sum((cos_loss(p1, t2) + cos_loss(p2, t1)) * m) / (
            2.0 * jnp.maximum(m.sum(), 1.0))

        # EMA teacher update (cosine-annealed decay -> 1.0), inside the step
        step = variables["ema"]["step"]
        frac = jnp.minimum(step / max(self.ema_total_steps, 1), 1.0)
        beta = 1.0 - (1.0 - self.ema_decay) * (
            jnp.cos(jnp.pi * frac) + 1.0) / 2.0

        def ema(t, s):
            return t * beta + (1.0 - beta) * jax.lax.stop_gradient(s)

        new_teacher = {"params": jax.tree.map(
            ema, variables["teacher"]["params"], variables["params"]["enc"])}
        updates = {}
        if has_bn:
            new_stats = upd2["batch_stats"]
            new_teacher["batch_stats"] = jax.tree.map(
                ema, variables["teacher"]["batch_stats"], new_stats["enc"])
            updates["batch_stats"] = new_stats
        updates["teacher"] = new_teacher
        updates["ema"] = {"step": step + 1.0}
        return loss, updates

    def evaluate(self, variables, graph: Graph):
        emb = self.model.apply(
            {k: variables[k] for k in ("params", "batch_stats")
             if k in variables},
            graph, graph.x, False, method=self.model.embed)
        return logreg_probe(np.asarray(emb), graph)


class UnsupGraphSAGEWrapper(DGIWrapper):
    """Unsupervised GraphSAGE: random-walk co-occurrence positives + uniform
    negatives with the sigmoid loss (reference unsup_graphsage_mw and
    UnsupNeighborSamplerDataset, data/sampler.py:119-185). Walks are sampled
    host-side per epoch (native C++ when built) and enter the jitted step as
    batch arrays — static shapes, no retrace."""

    walk_length = 3
    num_negatives = 8
    pairs_per_epoch = 2048
    refresh_per_epoch = True

    def prepare_graph(self, graph: Graph) -> Graph:
        graph = super().prepare_graph(graph)
        from ..data.sampling import graph_csr

        self._csr = graph_csr(graph)
        self._rng_np = np.random.default_rng(0)
        return graph

    def init(self, rng, graph: Graph):
        return self.model.init({"params": rng, "dropout": rng}, graph,
                               graph.x, training=False)

    def train_batches(self, graph: Graph):
        from .. import native

        indptr, indices, _ = self._csr
        rng_np = self._rng_np
        starts = rng_np.integers(0, graph.num_nodes, self.pairs_per_epoch)
        if native.available():
            walks = native.random_walk(indptr, indices, starts,
                                       self.walk_length,
                                       seed=int(rng_np.integers(0, 2 ** 62)))
        else:
            from ..models.emb.walks import random_walks as _rw

            walks = _rw(indptr, indices, 1, self.walk_length,
                        seed=int(rng_np.integers(0, 2 ** 31)))[starts]
        neg = rng_np.integers(0, graph.num_nodes,
                              (starts.shape[0], self.num_negatives))
        return [(graph, jnp.asarray(starts), jnp.asarray(walks[:, -1]),
                 jnp.asarray(neg))]

    def loss(self, variables, batch, rng, training: bool = True):
        graph, u, v, neg = batch
        z = self.model.apply(variables, graph, graph.x, training,
                             rngs={"dropout": rng})
        zu, zv, zn = z[u], z[v], z[neg]
        pos = jnp.sum(zu * zv, -1)
        negs = jnp.einsum("bd,bkd->bk", zu, zn)
        loss = -jnp.mean(jax.nn.log_sigmoid(pos)) - jnp.mean(
            jax.nn.log_sigmoid(-negs))
        return loss, {}

    def evaluate(self, variables, graph: Graph):
        emb = self.model.apply(variables, graph, graph.x, False)
        return logreg_probe(np.asarray(emb), graph)


class SelfAuxiliaryWrapper(NodeClfWrapper):
    """Joint supervised + self-supervised auxiliary training — rebuild of the
    reference self_auxiliary_mw (cogdl/wrappers/model_wrapper/
    node_classification/self_auxiliary_mw.py:16-99 and SSLTask family :87+).

    TPU-native divergences from the reference:
    - the task transform (edge masking / attribute masking / distance-pair
      sampling) runs ONCE host-side with static shapes instead of per step
      (per-step re-masking would retrace the jitted step every iteration);
    - the auxiliary heads are plain param pytrees in ``variables['aux']``
      optimized jointly with the encoder;
    - the reference's AttributeMask stores its reconstruction targets AFTER
      zeroing the features (self_auxiliary_mw.py:166-167 — the loss then
      regresses zeros); here the targets are the pre-mask features.

    auxiliary_task: "edgemask" | "attributemask" | "pairwise-distance".
    """

    auxiliary_task = "edgemask"
    mask_ratio = 0.1
    aux_weight = 1.0
    num_pairs = 4000

    def __init__(self, model, dataset=None, auxiliary_task: str = "edgemask",
                 mask_ratio: float = 0.1, aux_weight: float = 1.0,
                 num_pairs: int = 4000, seed: int = 0):
        super().__init__(model, dataset)
        self.auxiliary_task = auxiliary_task
        self.mask_ratio = mask_ratio
        self.aux_weight = aux_weight
        self.num_pairs = num_pairs
        self.seed = seed

    # -- task transforms (host-side, static shapes) --------------------------
    def prepare_graph(self, graph: Graph) -> Graph:
        full = super().prepare_graph(graph)
        rng = np.random.default_rng(self.seed)
        E = graph.num_edges
        row = np.asarray(graph.row)[:E]
        col = np.asarray(graph.col)[:E]
        N = graph.num_nodes
        task = self.auxiliary_task

        if task == "edgemask":
            # mask canonical undirected pairs, drop BOTH directions
            # (reference EdgeMask.transform_data, self_auxiliary_mw.py:105-123)
            canon = np.unique(np.stack([np.minimum(row, col),
                                        np.maximum(row, col)], 1), axis=0)
            canon = canon[canon[:, 0] != canon[:, 1]]
            k = max(1, int(self.mask_ratio * canon.shape[0]))
            perm = rng.permutation(canon.shape[0])
            masked = canon[perm[:k]]
            held = set(map(tuple, masked.tolist()))
            keep = np.array([(min(r, c), max(r, c)) not in held
                             for r, c in zip(row, col)])
            neg = []
            while len(neg) < k:
                u, v = rng.integers(0, N, 2)
                if u != v and (min(u, v), max(u, v)) not in held:
                    neg.append((u, v))
            self._pairs = jnp.asarray(np.concatenate(
                [masked, np.asarray(neg, np.int64)]))
            self._pair_labels = jnp.asarray(np.concatenate(
                [np.ones(k, np.int32), np.zeros(k, np.int32)]))
            g_train = self._rebuild(graph, row[keep], col[keep])
            self._train_graph = super().prepare_graph(g_train)
        elif task == "attributemask":
            # zero features of masked non-train nodes; regress originals
            # (reference AttributeMask, self_auxiliary_mw.py:148-174)
            train_mask = np.asarray(graph.train_mask)[:N]
            unlabeled = np.nonzero(~train_mask)[0]
            k = min(max(1, int(self.mask_ratio * N)), unlabeled.size)
            masked = rng.permutation(unlabeled)[:k]
            x = np.asarray(full.x)
            self._masked_nodes = jnp.asarray(masked)
            self._feat_targets = jnp.asarray(x[masked])
            x = x.copy()
            x[masked] = 0.0
            self._train_graph = full.replace(x=jnp.asarray(x))
        elif task == "pairwise-distance":
            # BFS shortest-path distance classes 1 / 2 / >=3
            # (reference PairwiseDistance, self_auxiliary_mw.py:176-305)
            from ..data.sampling import graph_csr

            indptr, indices, _ = graph_csr(full)
            per_class = self.num_pairs // 3
            pairs, labels = [], []
            anchors = rng.permutation(N)[: min(N, 4 * per_class)]
            buckets = [[], [], []]
            for a in anchors:
                dist = {int(a): 0}
                frontier = [int(a)]
                for d in (1, 2):
                    nxt = []
                    for u in frontier:
                        for v in indices[indptr[u]: indptr[u + 1]]:
                            v = int(v)
                            if v < N and v not in dist:
                                dist[v] = d
                                nxt.append(v)
                    frontier = nxt
                for v, d in dist.items():
                    if d > 0 and len(buckets[d - 1]) < per_class:
                        buckets[d - 1].append((int(a), v))
                while len(buckets[2]) < per_class:
                    v = int(rng.integers(0, N))
                    if v not in dist:
                        buckets[2].append((int(a), v))
                        break
                if all(len(b) >= per_class for b in buckets):
                    break
            for cls, b in enumerate(buckets):
                if not b:  # tiny/dense graphs may lack a distance class
                    continue
                arr = np.asarray(b, np.int64)
                pairs.append(arr)
                labels.append(np.full(arr.shape[0], cls, np.int32))
            self._pairs = jnp.asarray(np.concatenate(pairs))
            self._pair_labels = jnp.asarray(np.concatenate(labels))
            self._num_dist_classes = 3
            self._train_graph = full
        else:
            raise ValueError(
                f"unknown auxiliary_task {task!r}; known: edgemask | "
                "attributemask | pairwise-distance")
        return full

    def _rebuild(self, graph: Graph, row, col) -> Graph:
        from ..data.graph import from_coo

        return from_coo(
            np.stack([row, col]), num_nodes=graph.num_nodes,
            x=None if graph.x is None else np.asarray(graph.x)[: graph.num_nodes],
            y=None if graph.y is None else np.asarray(graph.y)[: graph.num_nodes],
            train_mask=np.asarray(graph.train_mask)[: graph.num_nodes],
            val_mask=np.asarray(graph.val_mask)[: graph.num_nodes],
            test_mask=np.asarray(graph.test_mask)[: graph.num_nodes],
            meta=dict(graph.meta))

    def train_batches(self, graph: Graph):
        return [self._train_graph]

    # -- parameters -----------------------------------------------------------
    def init(self, rng, graph: Graph):
        import jax

        r1, r2 = jax.random.split(rng)
        model_vars = self.model.init(
            {"params": r1, "dropout": r1}, graph, graph.x, training=False)
        emb = self.model.apply(model_vars, graph, graph.x,
                               method=self.model.embed)
        h = emb.shape[-1]
        task = self.auxiliary_task
        if task == "edgemask":
            out_dim = 2  # reference: Linear(hidden, 2) (self_auxiliary_mw.py:102)
        elif task == "attributemask":
            out_dim = graph.x.shape[-1]
        else:
            out_dim = self._num_dist_classes
        scale = 1.0 / np.sqrt(h)
        aux = {"w": jax.random.normal(r2, (h, out_dim)) * scale,
               "b": jnp.zeros((out_dim,))}
        # the Trainer optimizes variables["params"] (trainer.py:92), so both
        # the encoder params and the aux head must live under that key
        return {"params": {"model": model_vars.get("params", {}),
                           "aux": aux},
                **{k: v for k, v in model_vars.items() if k != "params"}}

    @staticmethod
    def _split(variables):
        model_vars = {"params": variables["params"]["model"],
                      **{k: v for k, v in variables.items()
                         if k != "params"}}
        return model_vars, variables["params"]["aux"]

    # -- joint loss -----------------------------------------------------------
    def loss(self, variables, graph: Graph, rng, training: bool = True):
        import jax

        model_vars, aux = self._split(variables)
        sup_loss, _ = super().loss(model_vars, graph, rng, training)
        emb = self.model.apply(model_vars, graph, graph.x,
                               method=self.model.embed)
        task = self.auxiliary_task
        if task == "attributemask":
            pred = emb[self._masked_nodes] @ aux["w"] + aux["b"]
            ssl = jnp.mean((pred - self._feat_targets) ** 2)
        else:
            diff = jnp.abs(emb[self._pairs[:, 0]] - emb[self._pairs[:, 1]])
            logits = diff @ aux["w"] + aux["b"]
            logp = jax.nn.log_softmax(logits)
            ssl = -jnp.mean(jnp.take_along_axis(
                logp, self._pair_labels[:, None].astype(jnp.int32), 1))
        return sup_loss + self.aux_weight * ssl, {}

    def evaluate(self, variables, graph: Graph):
        return super().evaluate(self._split(variables)[0], graph)
