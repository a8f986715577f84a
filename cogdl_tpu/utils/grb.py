"""Adversarial robustness utilities (GRB) — rebuild of reference
cogdl/utils/grb_utils.py + examples/GRB attack/defense families.

Attacks perturb features (FGSM/PGD) or inject nodes (speit/tdgia-style
random injection), all with **static shapes**: injected nodes live in the
graph's existing padding region, so attack graphs reuse the compiled step.
The Trainer-equivalent hook is ``evaluate_under_attack``.
"""

from __future__ import annotations

from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..data.graph import Graph, from_coo


def fgsm_attack_features(model_apply, variables, graph: Graph,
                         epsilon: float = 0.1,
                         mask: Optional[jnp.ndarray] = None) -> Graph:
    """FGSM on node features: x' = x + ε·sign(∇_x L) on test nodes
    (reference examples/GRB/attack/modification/fgsm.py behavior)."""
    if mask is None:
        mask = graph.test_mask & graph.node_mask()

    def loss_fn(x):
        logits = model_apply(variables, graph.replace(x=x))
        logp = jax.nn.log_softmax(logits, -1)
        y = jnp.clip(graph.y, 0, logits.shape[-1] - 1).astype(jnp.int32)
        per = -jnp.take_along_axis(logp, y[:, None], 1).squeeze(-1)
        m = mask.astype(logits.dtype)
        return jnp.sum(per * m) / jnp.maximum(m.sum(), 1.0)

    g = jax.grad(loss_fn)(graph.x)
    x_adv = graph.x + epsilon * jnp.sign(g) * mask[:, None]
    return graph.replace(x=x_adv)


def pgd_attack_features(model_apply, variables, graph: Graph,
                        epsilon: float = 0.1, steps: int = 10,
                        step_size: float = 0.02,
                        mask: Optional[jnp.ndarray] = None) -> Graph:
    """PGD: iterated FGSM with L∞ projection (reference pgd attack)."""
    if mask is None:
        mask = graph.test_mask & graph.node_mask()
    x0 = graph.x

    def loss_fn(x):
        logits = model_apply(variables, graph.replace(x=x))
        logp = jax.nn.log_softmax(logits, -1)
        y = jnp.clip(graph.y, 0, logits.shape[-1] - 1).astype(jnp.int32)
        per = -jnp.take_along_axis(logp, y[:, None], 1).squeeze(-1)
        m = mask.astype(logits.dtype)
        return jnp.sum(per * m) / jnp.maximum(m.sum(), 1.0)

    grad_fn = jax.jit(jax.grad(loss_fn))
    x = x0
    for _ in range(steps):
        g = grad_fn(x)
        x = x + step_size * jnp.sign(g) * mask[:, None]
        x = jnp.clip(x, x0 - epsilon, x0 + epsilon)
    return graph.replace(x=x)


def random_injection_attack(graph: Graph, n_inject: int = 20,
                            n_edges_per: int = 10, feat_scale: float = 2.0,
                            seed: int = 0) -> Graph:
    """Node-injection attack (speit/tdgia family): add adversarial nodes
    wired to random test nodes with large-magnitude features. Host-side
    rebuild; injected nodes carry no labels and stay outside all masks."""
    rng = np.random.default_rng(seed)
    N, E = graph.num_nodes, graph.num_edges
    row = np.asarray(graph.row)[:E]
    col = np.asarray(graph.col)[:E]
    w = np.asarray(graph.edge_weight)[:E]
    targets = np.nonzero(np.asarray(graph.test_mask)[:N])[0]
    inj_ids = N + np.arange(n_inject)
    new_r, new_c = [row], [col]
    for i, inj in enumerate(inj_ids):
        t = rng.choice(targets, size=min(n_edges_per, targets.size),
                       replace=False)
        new_r.extend([t, np.full(t.size, inj)])
        new_c.extend([np.full(t.size, inj), t])
    row2 = np.concatenate(new_r)
    col2 = np.concatenate(new_c)
    w2 = np.concatenate([w, np.ones(row2.size - E, np.float32)])
    F = graph.num_features
    x = np.asarray(graph.x)[:N]
    x_inj = rng.normal(size=(n_inject, F)).astype(np.float32) * feat_scale
    y = np.zeros(N + n_inject, np.int32)
    y[:N] = np.asarray(graph.y)[:N]

    def ext(mask):
        m = np.zeros(N + n_inject, bool)
        m[:N] = np.asarray(mask)[:N]
        return m

    return from_coo(
        np.stack([row2, col2]), num_nodes=N + n_inject, edge_weight=w2,
        x=np.concatenate([x, x_inj]), y=y,
        train_mask=ext(graph.train_mask), val_mask=ext(graph.val_mask),
        test_mask=ext(graph.test_mask), meta=dict(graph.meta))


def evaluate_under_attack(model_apply, variables, graph: Graph,
                          attacks: Dict[str, Callable[..., Graph]] = None
                          ) -> Dict[str, float]:
    """Accuracy before/after each attack (the Trainer.attack loop,
    reference trainer.py:346-379)."""
    from .evaluator import masked_accuracy

    if attacks is None:
        attacks = {
            "fgsm": lambda: fgsm_attack_features(model_apply, variables, graph),
            "injection": lambda: random_injection_attack(graph),
        }
    out = {}
    logits = model_apply(variables, graph)
    out["clean_acc"] = float(masked_accuracy(
        logits, graph.y, graph.test_mask & graph.node_mask()))
    for name, fn in attacks.items():
        g_adv = fn()
        logits = model_apply(variables, g_adv)
        out[f"{name}_acc"] = float(masked_accuracy(
            logits, g_adv.y, g_adv.test_mask & g_adv.node_mask()))
    return out


def gcn_svd_defense(graph: Graph, rank: int = 16) -> Graph:
    """GCN-SVD defense: low-rank adjacency reconstruction, re-sparsified
    (reference examples/GRB/defense gcnsvd)."""
    import scipy.sparse as sp
    from scipy.sparse.linalg import svds

    from ..models.emb.base import graph_to_scipy

    A = graph_to_scipy(graph).astype(np.float64)
    k = min(rank, min(A.shape) - 2)
    u, s, vt = svds(A, k=k)
    A_lr = (u * s) @ vt
    # adaptive sparsification: keep about as many entries as original edges
    flat = A_lr.ravel()
    E = max(graph.num_edges, 1)
    if flat.size > E:
        thresh = np.partition(flat, -E)[-E]
        A_lr[A_lr < max(thresh, 1e-6)] = 0.0
    r, c = np.nonzero(A_lr)
    g = from_coo(np.stack([r, c]), num_nodes=graph.num_nodes,
                 edge_weight=A_lr[r, c].astype(np.float32),
                 meta=dict(graph.meta))
    n = min(g.n_pad, graph.x.shape[0])
    return g.replace(
        x=jnp.asarray(np.asarray(graph.x))[: g.n_pad] if graph.x.shape[0] >= g.n_pad else graph.x,
        y=graph.y[: g.n_pad], train_mask=graph.train_mask[: g.n_pad],
        val_mask=graph.val_mask[: g.n_pad], test_mask=graph.test_mask[: g.n_pad])


# ---------------------------------------------------------------------------
# Round-2 GRB breadth: TDGIA / SPEIT injection attacks, GNNGuard defense
# ---------------------------------------------------------------------------

def _inject_graph(graph: Graph, edges_rc, x_inj) -> Graph:
    """Host-side rebuild with `len(x_inj)` injected nodes and the given
    (row, col) undirected attack edges; injected nodes stay outside all
    masks."""
    N, E = graph.num_nodes, graph.num_edges
    row = np.asarray(graph.row)[:E]
    col = np.asarray(graph.col)[:E]
    w = np.asarray(graph.edge_weight)[:E]
    ar, ac = edges_rc
    row2 = np.concatenate([row, ar, ac])
    col2 = np.concatenate([col, ac, ar])
    w2 = np.concatenate([w, np.ones(2 * len(ar), np.float32)])
    n_inject = x_inj.shape[0]
    x = np.concatenate([np.asarray(graph.x)[:N], np.asarray(x_inj)])
    y = np.zeros(N + n_inject, np.int32)
    y[:N] = np.asarray(graph.y)[:N]

    def ext(mask):
        m = np.zeros(N + n_inject, bool)
        m[:N] = np.asarray(mask)[:N]
        return m

    return from_coo(
        np.stack([row2, col2]), num_nodes=N + n_inject, edge_weight=w2,
        x=x, y=y, train_mask=ext(graph.train_mask),
        val_mask=ext(graph.val_mask), test_mask=ext(graph.test_mask),
        meta=dict(graph.meta))


def _optimize_injected_features(model_apply, variables, graph: Graph,
                                n_inject: int, targets: np.ndarray,
                                feat_lim: float, lr: float, n_epoch: int,
                                opt: str = "sin", seed: int = 0):
    """Gradient feature optimization of the injected block (the shared core
    of TDGIA/SPEIT, reference tdgia.py:374 ``update_features``): maximise
    the model's loss on the target nodes wrt the injected features, with
    the ``sin`` smooth box parametrisation (x = lim·sin(w)) or ``clip``."""
    inj_slice = slice(graph.num_nodes - n_inject, graph.num_nodes)
    tmask = jnp.zeros(graph.n_pad, bool).at[jnp.asarray(targets)].set(True)
    y = jnp.clip(graph.y, 0, None).astype(jnp.int32)
    x_base = graph.x

    def attack_loss(w):
        x_inj = (feat_lim * jnp.sin(w) if opt == "sin"
                 else jnp.clip(w, -feat_lim, feat_lim))
        x = x_base.at[inj_slice].set(x_inj)
        logits = model_apply(variables, graph.replace(x=x))
        logp = jax.nn.log_softmax(logits, -1)
        per = -jnp.take_along_axis(logp, y[:, None], 1)[:, 0]
        m = tmask.astype(logits.dtype)
        # maximise target CE → minimise negative
        return -jnp.sum(per * m) / jnp.maximum(m.sum(), 1.0)

    rng = np.random.default_rng(seed)
    w = jnp.asarray(rng.normal(
        size=(n_inject, graph.x.shape[1])).astype(np.float32) * 0.1)
    grad_fn = jax.jit(jax.grad(attack_loss))
    for _ in range(n_epoch):
        g = grad_fn(w)
        w = w - lr * jnp.sign(g)
    return (feat_lim * jnp.sin(w) if opt == "sin"
            else jnp.clip(w, -feat_lim, feat_lim))


def tdgia_injection_attack(model_apply, variables, graph: Graph,
                           n_inject: int = 20, n_edge_max: int = 10,
                           lr: float = 0.05, n_epoch: int = 30,
                           feat_lim: float = 1.0, weight1: float = 0.9,
                           weight2: float = 0.1, sequential_step: float = 0.5,
                           seed: int = 0) -> Graph:
    """Topological Defective Graph Injection Attack (reference
    examples/GRB/attack/injection/tdgia.py:14).

    Sequential rounds: (1) score each test node by topological
    defectiveness — current confidence in its ORIGINAL predicted label,
    down-weighted by degree (tdgia.py:295-305) — (2) wire the round's
    injected nodes to the top-scored targets with class-balanced
    round-robin assignment (tdgia.py:313-341), (3) optimise injected
    features by gradient ascent on the targets' loss with the smooth
    ``sin`` box (tdgia.py:374)."""
    rng = np.random.default_rng(seed)
    g_cur = graph
    targets_all = np.nonzero(np.asarray(graph.test_mask)[: graph.num_nodes])[0]
    logits0 = np.asarray(model_apply(variables, graph))
    labels_origin = logits0.argmax(-1)

    rounds = max(int(np.ceil(1.0 / sequential_step)), 1)
    per_round = [n_inject // rounds] * rounds
    per_round[-1] += n_inject - sum(per_round)
    for rnd, k in enumerate(per_round):
        if k <= 0:
            continue
        logits = np.asarray(model_apply(variables, g_cur))
        probs = np.exp(logits - logits.max(-1, keepdims=True))
        probs /= probs.sum(-1, keepdims=True)
        deg = np.zeros(g_cur.num_nodes)
        np.add.at(deg, np.asarray(g_cur.row)[: g_cur.num_edges], 1.0)
        deg += 1.0
        t = targets_all
        conf = probs[t, labels_origin[t]] + 2.0
        score = (weight1 * conf / deg[t]
                 + weight2 * conf / np.sqrt(deg[t])
                 / np.sqrt(n_edge_max))
        top = t[np.argsort(score)[-k * n_edge_max:]]
        # class-balanced round-robin assignment of targets to new nodes
        by_class = {}
        rng.shuffle(top)
        for v in top:
            by_class.setdefault(labels_origin[v], []).append(v)
        ar, ac = [], []
        pos = {c: 0 for c in by_class}
        for i in range(k):
            inj = g_cur.num_nodes + i
            for _ in range(n_edge_max):
                c = min(by_class,
                        key=lambda cc: pos[cc] / max(len(by_class[cc]), 1))
                if pos[c] < len(by_class[c]):
                    ar.append(inj)
                    ac.append(by_class[c][pos[c]])
                    pos[c] += 1
        x0 = np.zeros((k, graph.num_features), np.float32)
        g_cur = _inject_graph(g_cur, (np.asarray(ar), np.asarray(ac)), x0)
        x_inj = _optimize_injected_features(
            model_apply, variables, g_cur, k, targets_all, feat_lim, lr,
            n_epoch, opt="sin", seed=seed + rnd)
        x = np.array(g_cur.x)
        x[g_cur.num_nodes - k: g_cur.num_nodes] = np.asarray(x_inj)
        g_cur = g_cur.replace(x=jnp.asarray(x))
    return g_cur


def speit_injection_attack(model_apply, variables, graph: Graph,
                           n_inject: int = 20, n_edge_max: int = 10,
                           lr: float = 0.05, n_epoch: int = 30,
                           feat_lim: float = 1.0, mode: str = "random-inter",
                           seed: int = 0) -> Graph:
    """SPEIT injection attack (reference
    examples/GRB/attack/injection/speit.py:150): spread one edge per target
    across the injected nodes round-robin until each reaches ``n_edge_max``
    (``random-inter`` also wires injected nodes to each other), then PGD
    feature optimisation with hard clipping."""
    rng = np.random.default_rng(seed)
    targets = np.nonzero(np.asarray(graph.test_mask)[: graph.num_nodes])[0]
    rng.shuffle(targets)
    n_edges = np.zeros(n_inject, np.int64)
    ar, ac = [], []
    for v in targets:
        active = np.nonzero(n_edges < n_edge_max)[0]
        if active.size == 0:
            break
        inj = int(rng.choice(active))
        ar.append(graph.num_nodes + inj)
        ac.append(v)
        n_edges[inj] += 1
    if mode == "random-inter" and n_inject > 1:
        for i in range(n_inject - 1):  # chain the injected block
            ar.append(graph.num_nodes + i)
            ac.append(graph.num_nodes + i + 1)
    x0 = np.zeros((n_inject, graph.num_features), np.float32)
    g_adv = _inject_graph(graph, (np.asarray(ar), np.asarray(ac)), x0)
    x_inj = _optimize_injected_features(
        model_apply, variables, g_adv, n_inject, targets, feat_lim, lr,
        n_epoch, opt="clip", seed=seed)
    x = np.array(g_adv.x)
    x[g_adv.num_nodes - n_inject: g_adv.num_nodes] = np.asarray(x_inj)
    return g_adv.replace(x=jnp.asarray(x))


# modification attack family (edge flips under budget) lives in its own
# module; re-exported here so utils.grb is the one GRB namespace
from .grb_modification import (  # noqa: E402,F401
    apply_edge_flips,
    dice_modification_attack,
    fga_modification_attack,
    flip_modification_attack,
    nea_modification_attack,
    pgd_modification_attack,
    prbcd_modification_attack,
    rand_modification_attack,
    stack_modification_attack,
)


def gnnguard_reweight(graph: Graph, x: jnp.ndarray,
                      threshold: float = 0.1) -> Graph:
    """GNNGuard edge reweighting (reference examples/GRB/defense/
    gnnguard.py:109 ``att_coef``): cosine similarity of endpoint features
    per edge, pruned below ``threshold``, row-L1-normalised, self-loops
    re-added at 1/(deg+1). Pure jit-able edge ops — static shapes (pruned
    edges keep their slot with weight 0)."""
    xn = x * jax.lax.rsqrt(jnp.sum(x * x, -1, keepdims=True) + 1e-12)
    sim = jnp.sum(jnp.take(xn, graph.row, axis=0, mode="clip")
                  * jnp.take(xn, graph.col, axis=0, mode="clip"), -1)
    sim = jnp.where(sim < threshold, 0.0, sim)
    sim = sim * graph.edge_mask() * (graph.row != graph.col)
    row_sum = jax.ops.segment_sum(sim, graph.row, graph.n_pad,
                                  indices_are_sorted=True)
    w = sim / jnp.maximum(jnp.take(row_sum, graph.row, mode="clip"), 1e-12)
    # self-loop weight 1/(deg+1): ride the existing self-loop edge slots
    deg = jax.ops.segment_sum((sim > 0).astype(jnp.float32), graph.row,
                              graph.n_pad, indices_are_sorted=True)
    lam = 1.0 / (deg + 1.0)
    is_loop = (graph.row == graph.col) & graph.edge_mask()
    w = jnp.where(is_loop, jnp.take(lam, graph.row, mode="clip"), w)
    return graph.replace(edge_weight=w)
