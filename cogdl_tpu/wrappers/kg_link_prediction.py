"""GNN-based KG link prediction wrapper — rebuild of the reference's
``gnn_kg_link_prediction_mw`` (cogdl/wrappers/model_wrapper/link_prediction/
gnn_kg_link_prediction_mw.py:8) + its data wrapper.

Task: train an RGCN/CompGCN encoder over the training triples, score triples
with DistMult/ConvE, evaluate raw-protocol MRR / hits@{1,3,10} by ranking
each eval triple's tail (and head, via inverse relations) against every
entity (cogdl/utils/link_prediction_utils.py:8 ``cal_mrr``).

TPU-first redesign of the reference's training step (rgcn.py:124 ``loss``):
the reference samples a batch of edges, builds a dynamic subgraph, reindexes
it, and encodes only that subgraph — all dynamic shapes. Here the encoder
runs over the full static train graph every step and a FIXED-size uniform
sample of positive triples plus corrupted negatives feeds the BCE loss
(same estimator as ``sampling_edge_uniform``, link_prediction_utils.py:150,
with static shapes).

Relation convention (reference compgcn.py:250 ``add_reversed_edges``): the
train graph carries each triple forward (type r) and inverse (type r + R);
self-loops get type 2R. Head ranking reuses tail ranking through the
inverse relation ids.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from ..data.graph import from_coo
from ..models.nn.kg_gnn import KGLinkPredictor


class KGLinkPredictionWrapper:
    eval_metric = "val_mrr"
    eval_mode = "max"
    jit_eval = False

    def __init__(self, model, dataset=None, score_func: str = "distmult",
                 batch_size: int = 1024, neg_ratio: int = 1,
                 penalty: float = 0.001, protocol: str = "raw",
                 seed: int = 0):
        if dataset is None or dataset.triples is None:
            raise ValueError(
                "kg_link_prediction needs a triples dataset "
                "(e.g. 'random-kg', fb13, fb15k, wn18)")
        t = dataset.triples
        self.triples = t
        self.num_entities = int(t["num_entities"])
        self.num_relations = int(t["num_relations"])
        self.batch_size = batch_size
        self.neg_ratio = max(int(neg_ratio), 1)
        self.penalty = penalty
        if protocol not in ("raw", "filtered"):
            raise ValueError("protocol must be 'raw' or 'filtered'")
        # "raw" is the reference default (link_prediction_utils.py:8; its
        # protocol="filtered" branch raises NotImplementedError). "filtered"
        # is the published-leaderboard protocol (BASELINE.md MRR tables),
        # shared with the triple-embedding wrapper: other KNOWN true triples
        # are excluded from each ranking.
        self.protocol = protocol
        self.seed = seed
        hidden = getattr(model, "hidden_size", 64)
        # rebuild the encoder for the KG convention: hidden-sized ends and
        # the doubled relation vocabulary (fwd + inverse + self-loop)
        total_rel = 2 * self.num_relations + 1
        updates = dict(num_relations=total_rel, in_features=hidden,
                       out_features=hidden)
        if hasattr(model, "return_rel"):
            updates["return_rel"] = True
        if hasattr(model, "num_entities"):
            updates["num_entities"] = 0   # KGLinkPredictor owns the entities
        encoder = model.clone(**{k: v for k, v in updates.items()
                                 if hasattr(model, k)})
        self.model = KGLinkPredictor(
            encoder=encoder, num_entities=self.num_entities,
            num_relations=total_rel, hidden_size=hidden,
            score_func=score_func)

    # -- data ---------------------------------------------------------------
    def prepare_graph(self, graph=None):
        t = self.triples
        train = np.asarray(t["train"], np.int64)
        h, r, tl = train[:, 0], train[:, 1], train[:, 2]
        R, N = self.num_relations, self.num_entities
        loops = np.arange(N)
        row = np.concatenate([tl, h, loops])     # dst
        col = np.concatenate([h, tl, loops])     # src
        et = np.concatenate([r, r + R, np.full(N, 2 * R)]).astype(np.int32)
        g = from_coo(np.stack([row, col]), num_nodes=N,
                     edge_type=et, meta={"num_relations": 2 * R + 1})
        self._train_triples = jnp.asarray(train.astype(np.int32))
        self._eval_triples = {
            "val": np.asarray(t["valid"], np.int64),
            "test": np.asarray(t["test"], np.int64),
        }
        if self.protocol == "filtered":
            # known-true map over ALL splits, in ranking coordinates:
            # (h, r) → tails and (t, r + R) → heads (inverse relation)
            known: Dict[tuple, set] = {}
            for split in (train, self._eval_triples["val"],
                          self._eval_triples["test"]):
                for hh, rr, tt in np.asarray(split, np.int64):
                    known.setdefault((int(hh), int(rr)), set()).add(int(tt))
                    known.setdefault((int(tt), int(rr) + R), set()).add(int(hh))
            self._known = known
        return g

    def train_batches(self, graph):
        return [graph]

    # -- training -----------------------------------------------------------
    def init(self, rng, graph):
        # init through loss_logits so the scorer's params materialise too
        # (ConvE has conv/fc params that plain encode() never touches)
        z = jnp.zeros((8,), jnp.int32)
        return self.model.init({"params": rng, "dropout": rng}, graph,
                               z, z, z, training=False,
                               method="loss_logits")

    def loss(self, variables, graph, rng, training: bool = True):
        tr = self._train_triples
        B, K = self.batch_size, self.neg_ratio
        r1, r2, r3, rd = jax.random.split(rng, 4)
        pick = jax.random.randint(r1, (B,), 0, tr.shape[0])
        h, r, t = tr[pick, 0], tr[pick, 1], tr[pick, 2]
        # corrupted negatives: replace head or tail uniformly (the
        # `sampling_edge_uniform` estimator, link_prediction_utils.py:150)
        ent = jax.random.randint(r2, (B * K,), 0, self.num_entities)
        hk = jnp.tile(h, (K,))
        tk = jnp.tile(t, (K,))
        corrupt_head = jax.random.bernoulli(r3, 0.5, (B * K,))
        nh = jnp.where(corrupt_head, ent, hk)
        nt = jnp.where(corrupt_head, tk, ent)
        hh = jnp.concatenate([h, nh])
        tt = jnp.concatenate([t, nt])
        rr = jnp.concatenate([r, jnp.tile(r, (K,))])
        labels = jnp.concatenate(
            [jnp.ones((B,), jnp.float32), jnp.zeros((B * K,), jnp.float32)])
        logits, reg = self.model.apply(
            variables, graph, hh, rr, tt, training=training,
            method="loss_logits", rngs={"dropout": rd})
        bce = jnp.maximum(logits, 0) - logits * labels + jnp.log1p(
            jnp.exp(-jnp.abs(logits)))
        return jnp.mean(bce) + self.penalty * reg, {}

    # -- evaluation ---------------------------------------------------------
    def evaluate(self, variables, graph) -> Dict[str, float]:
        out = {}
        for split, trip in self._eval_triples.items():
            if len(trip) == 0:
                continue
            mrr, hits = self._rank(variables, graph, trip)
            out[f"{split}_mrr"] = mrr
            for k, v in hits.items():
                out[f"{split}_hits{k}"] = v
        if "val_mrr" in out:
            out["val_acc"] = out["val_mrr"]
        if "test_mrr" in out:
            out["test_acc"] = out["test_mrr"]
        return out

    def _rank(self, variables, graph, triples, batch: int = 512):
        """Mean reciprocal rank: rank the true tail among all entities for
        (h, r, ?) and the true head via the inverse relation (r + R) —
        cal_mrr's ranks_h + ranks_t. Under ``protocol="filtered"`` the
        scores of other known-true candidates are dropped to -inf before
        ranking (the triple-embedding wrapper's protocol, shared here)."""
        R = self.num_relations
        trip = np.asarray(triples, np.int64)
        heads = np.concatenate([trip[:, 0], trip[:, 2]])
        rels = np.concatenate([trip[:, 1], trip[:, 1] + R])
        targets = np.concatenate([trip[:, 2], trip[:, 0]])
        ranks = []
        score_fn = jax.jit(lambda v, g, h, r: self.model.apply(
            v, g, h, r, method="rank_scores"))
        for i in range(0, len(heads), batch):
            h = heads[i: i + batch]
            r = rels[i: i + batch]
            tgt = targets[i: i + batch]
            n = len(h)
            if n < batch:  # static-shape pad
                h = np.pad(h, (0, batch - n))
                r = np.pad(r, (0, batch - n))
            # np.array (not asarray): jax buffers are read-only and the
            # filtered protocol writes -inf into the score rows
            s = np.array(score_fn(variables, graph, jnp.asarray(h, jnp.int32),
                                  jnp.asarray(r, jnp.int32)))[:n]
            s = s[:, : self.num_entities]
            tgt_score = s[np.arange(n), tgt].copy()
            if self.protocol == "filtered":
                for b_i in range(n):
                    others = self._known.get((int(h[b_i]), int(r[b_i])))
                    if others:
                        s[b_i, list(others)] = -np.inf
            ranks.append(1 + (s > tgt_score[:, None]).sum(1))
        ranks = np.concatenate(ranks).astype(np.float64)
        hits = {k: float((ranks <= k).mean()) for k in (1, 3, 10)}
        return float((1.0 / ranks).mean()), hits
