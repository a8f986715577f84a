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
