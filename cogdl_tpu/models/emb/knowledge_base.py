"""KG triple embeddings: TransE / DistMult / RotatE / ComplEx.

Rebuild of reference cogdl/models/emb/{transe,distmult,rotate,complex}.py +
emb/knowledge_base.py (shared negative-sampling trainer) — here as one
jit-compiled scorer family trained with self-adversarial negative sampling,
evaluated with filtered MRR/Hits@k (utils/link_prediction_utils.py:8).
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np


class KGEModel:
    score_name = "transe"
    project_entities = False

    def __init__(self, num_entities: int = 0, num_relations: int = 0,
                 hidden_size: int = 200, gamma: float = 12.0,
                 negative_size: int = 64, lr: float = 1e-3,
                 batch_size: int = 1024, epochs: int = 50,
                 self_adversarial: float = 1.0, seed: int = 0, **kw):
        self.num_entities = num_entities
        self.num_relations = num_relations
        self.dim = hidden_size
        self.gamma = gamma
        self.negative_size = negative_size
        self.lr = lr
        self.batch_size = batch_size
        self.epochs = epochs
        self.alpha = self_adversarial
        self.seed = seed

    # -- scoring -----------------------------------------------------------
    def init_params(self, key):
        ke, kr = jax.random.split(key)
        e_dim, r_dim = self.entity_dim(), self.relation_dim()
        scale = self.gamma / self.dim
        return {
            "ent": jax.random.uniform(ke, (self.num_entities, e_dim),
                                      minval=-scale, maxval=scale),
            "rel": jax.random.uniform(kr, (self.num_relations, r_dim),
                                      minval=-scale, maxval=scale),
        }

    def entity_dim(self):
        return self.dim

    def relation_dim(self):
        return self.dim

    def score(self, h, r, t):
        """TransE: γ − ‖h + r − t‖ (reference emb/transe.py)."""
        return self.gamma - jnp.linalg.norm(h + r - t + 1e-12, axis=-1)

    # -- training ----------------------------------------------------------
    def train_triples(self, triples: Dict) -> Dict[str, np.ndarray]:
        import optax

        train = np.asarray(triples["train"])
        key = jax.random.PRNGKey(self.seed)
        params = self.init_params(key)
        tx = optax.adam(self.lr)
        opt_state = tx.init(params)
        B, K = self.batch_size, self.negative_size

        def score_fn(params, h_idx, r_idx, t_idx):
            h = params["ent"][h_idx]
            r = params["rel"][r_idx]
            t = params["ent"][t_idx]
            return self.score(h, r, t)

        @jax.jit
        def step(params, opt_state, batch, neg_ent, corrupt_head):
            def loss_fn(p):
                h, r, t = batch[:, 0], batch[:, 1], batch[:, 2]
                pos = score_fn(p, h, r, t)                       # [B]
                hn = jnp.where(corrupt_head[:, None], neg_ent, h[:, None])
                tn = jnp.where(corrupt_head[:, None], t[:, None], neg_ent)
                neg = score_fn(p, hn, r[:, None], tn)            # [B, K]
                # self-adversarial weighting (RotatE paper)
                w = jax.lax.stop_gradient(
                    jax.nn.softmax(self.alpha * neg, axis=1))
                pos_l = -jax.nn.log_sigmoid(pos).mean()
                neg_l = -(w * jax.nn.log_sigmoid(-neg)).sum(1).mean()
                return pos_l + neg_l

            loss, grads = jax.value_and_grad(loss_fn)(params)
            upd, opt_state2 = tx.update(grads, opt_state, params)
            new_params = optax.apply_updates(params, upd)
            if self.project_entities:
                # TransE unit-ball projection: e ← e / max(1, ‖e‖)
                ent = new_params["ent"]
                norm = jnp.linalg.norm(ent, axis=1, keepdims=True)
                new_params = {**new_params,
                              "ent": ent / jnp.maximum(norm, 1.0)}
            return new_params, opt_state2, loss

        rng = np.random.default_rng(self.seed)
        n = train.shape[0]
        nb = max(n // B, 1)
        for ep in range(self.epochs):
            perm = rng.permutation(n)
            for b in range(nb):
                sl = perm[b * B: (b + 1) * B]
                if sl.shape[0] < B:
                    sl = np.concatenate([sl, perm[: B - sl.shape[0]]])
                batch = jnp.asarray(train[sl])
                neg = jnp.asarray(rng.integers(0, self.num_entities, (B, K)))
                ch = jnp.asarray(rng.integers(0, 2, B) == 1)
                params, opt_state, loss = step(params, opt_state, batch, neg, ch)
        self.params = jax.tree.map(np.asarray, params)
        return self.params

    # -- filtered evaluation ----------------------------------------------
    def evaluate(self, triples: Dict, split: str = "test",
                 max_eval: int = 2000) -> Dict[str, float]:
        params = {k: jnp.asarray(v) for k, v in self.params.items()}
        test = np.asarray(triples[split])[:max_eval]
        all_t = np.concatenate([np.asarray(triples[s])
                                for s in ("train", "valid", "test")])
        known = set(map(tuple, all_t.tolist()))

        @jax.jit
        def score_tails(h, r):
            hh = params["ent"][h][None, :]
            rr = params["rel"][r][None, :]
            return self.score(hh, rr, params["ent"])

        @jax.jit
        def score_heads(r, t):
            tt = params["ent"][t][None, :]
            rr = params["rel"][r][None, :]
            return self.score(params["ent"], rr, tt)

        ranks = []
        for h, r, t in test.tolist():
            for mode, scores, target in (
                ("tail", np.asarray(score_tails(h, r)), t),
                ("head", np.asarray(score_heads(r, t)), h),
            ):
                s_target = scores[target]
                better = scores > s_target
                tied = scores == s_target
                tied[target] = False
                # filtered protocol: ignore other true triples
                contenders = np.nonzero(better | tied)[0]
                for cand in contenders:
                    key = ((h, r, int(cand)) if mode == "tail"
                           else (int(cand), r, t))
                    if key in known:
                        better[cand] = False
                        tied[cand] = False
                # mean-rank tie breaking: strictly-greater alone would let a
                # collapsed model (all scores equal) report MRR == 1.0
                ranks.append(1 + int(better.sum()) + 0.5 * int(tied.sum()))
        ranks = np.asarray(ranks, np.float64)
        return {
            "mrr": float((1.0 / ranks).mean()),
            "mr": float(ranks.mean()),
            "hits@1": float((ranks <= 1).mean()),
            "hits@3": float((ranks <= 3).mean()),
            "hits@10": float((ranks <= 10).mean()),
        }


class TransE(KGEModel):
    score_name = "transe"
    project_entities = True


class DistMult(KGEModel):
    score_name = "distmult"

    def score(self, h, r, t):
        return jnp.sum(h * r * t, axis=-1)


class ComplEx(KGEModel):
    score_name = "complex"

    def relation_dim(self):
        return self.dim

    def score(self, h, r, t):
        hr, hi = jnp.split(h, 2, axis=-1)
        tr, ti = jnp.split(t, 2, axis=-1)
        rr, ri = jnp.split(r, 2, axis=-1)
        return jnp.sum(hr * rr * tr + hi * rr * ti
                       + hr * ri * ti - hi * ri * tr, axis=-1)

    def entity_dim(self):
        return self.dim

    def init_params(self, key):
        p = super().init_params(key)
        return p


class RotatE(KGEModel):
    score_name = "rotate"

    def relation_dim(self):
        return self.dim // 2

    def score(self, h, r, t):
        hr, hi = jnp.split(h, 2, axis=-1)
        tr, ti = jnp.split(t, 2, axis=-1)
        phase = r * jnp.pi  # relations as rotations
        rr, ri = jnp.cos(phase), jnp.sin(phase)
        dr = hr * rr - hi * ri - tr
        di = hr * ri + hi * rr - ti
        dist = jnp.sqrt(dr ** 2 + di ** 2 + 1e-12).sum(-1)
        return self.gamma - dist
