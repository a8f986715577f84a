"""GRB *modification* attack family + helpers — edge flips under a budget.

Rebuild of reference ``examples/GRB/attack/modification/{dice,rand,flip,nea,
stack,fga,prbcd}.py``. The combinatorial parts (candidate enumeration, greedy
flip loops) are host-side numpy over the repo's static Graph — the reference
uses scipy ``lil_matrix`` in-place loops; we compute candidate lists
vectorised and rebuild once with ``from_coo``. The gradient parts (FGA,
PRBCD) are re-designed for the edge-weight parametrisation: instead of
densifying the N×N adjacency (reference fga.py:51, prbcd's torch_sparse
coalesce), gradients are taken wrt a weight vector over a FIXED candidate
edge block riding the real edge list — statically shaped, jit-compiled once,
and the sym-normalisation is differentiated in-graph.

All attacks preserve node count / features / labels / masks and return a
fresh Graph; flips are undirected (both directions toggled).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..data.graph import Graph, from_coo

__all__ = [
    "apply_edge_flips",
    "dice_modification_attack",
    "rand_modification_attack",
    "flip_modification_attack",
    "nea_modification_attack",
    "stack_modification_attack",
    "fga_modification_attack",
    "prbcd_modification_attack",
    "pgd_modification_attack",
]


def _coo(graph: Graph) -> Tuple[np.ndarray, np.ndarray]:
    E = graph.num_edges
    return np.asarray(graph.row)[:E], np.asarray(graph.col)[:E]


def _edge_set(row: np.ndarray, col: np.ndarray, N: int) -> set:
    return set((row * N + col).tolist())


def apply_edge_flips(graph: Graph, flips: np.ndarray) -> Graph:
    """Toggle the undirected edges in ``flips`` ([k, 2] node pairs): present
    pairs are removed (both directions), absent pairs added with weight 1.
    Node payloads (x/y/masks) carry over; edge weights of surviving edges
    are preserved."""
    N = graph.num_nodes
    row, col = _coo(graph)
    w = np.asarray(graph.edge_weight)[: graph.num_edges]
    present = _edge_set(row, col, N)
    drop = set()
    add = []
    for i, j in np.asarray(flips, np.int64):
        i, j = int(i), int(j)
        if i == j:
            continue
        if i * N + j in present:
            present.discard(i * N + j)
            present.discard(j * N + i)
            drop.add(i * N + j)
            drop.add(j * N + i)
        else:
            # track as we go so (j, i) duplicates / re-flips of a pair the
            # loop already added don't create parallel edges
            present.add(i * N + j)
            present.add(j * N + i)
            add.append((i, j))
            add.append((j, i))
    keep = ~np.isin(row * N + col, np.fromiter(drop, np.int64, len(drop))) \
        if drop else np.ones(row.shape[0], bool)
    r2 = np.concatenate([row[keep], np.array([a for a, _ in add], np.int64)])
    c2 = np.concatenate([col[keep], np.array([b for _, b in add], np.int64)])
    w2 = np.concatenate([w[keep], np.ones(len(add), np.float32)])
    g = from_coo(np.stack([r2, c2]), num_nodes=N, edge_weight=w2,
                 n_pad=graph.n_pad, meta=dict(graph.meta))

    def cut(a):
        return None if a is None else a[: g.n_pad]

    return g.replace(x=cut(graph.x), y=cut(graph.y),
                     train_mask=cut(graph.train_mask),
                     val_mask=cut(graph.val_mask),
                     test_mask=cut(graph.test_mask))


def _target_ids(graph: Graph, mask=None) -> np.ndarray:
    m = graph.test_mask if mask is None else mask
    return np.nonzero(np.asarray(m)[: graph.num_nodes])[0]


def _target_incident_edges(graph: Graph,
                           targets: np.ndarray) -> np.ndarray:
    """[k, 2] distinct (target, other) pairs for every real edge whose
    DESTINATION is a target (reference ``adj_attack[index_target].nonzero()``
    enumerates target rows of the CSR)."""
    row, col = _coo(graph)
    sel = np.zeros(graph.num_nodes, bool)
    sel[targets] = True
    m = sel[row] & (row != col)
    return np.stack([row[m], col[m]], axis=1)


def dice_modification_attack(graph: Graph, n_edge_mod: int = 50,
                             ratio_delete: float = 0.6,
                             seed: int = 0, mask=None) -> Graph:
    """DICE — Delete Internally, Connect Externally (reference dice.py:11):
    remove same-label edges incident to test nodes, then add edges from test
    nodes to different-label nodes, under a total budget."""
    rng = np.random.default_rng(seed)
    N = graph.num_nodes
    y = np.asarray(graph.y)[:N]
    targets = _target_ids(graph, mask)
    pairs = _target_incident_edges(graph, targets)
    internal = pairs[y[pairs[:, 0]] == y[pairs[:, 1]]]
    n_delete = int(np.floor(n_edge_mod * ratio_delete))
    if internal.shape[0]:
        internal = internal[rng.permutation(internal.shape[0])][:n_delete]
    n_delete = internal.shape[0]

    n_connect = n_edge_mod - n_delete
    row, col = _coo(graph)
    present = _edge_set(row, col, N)
    ext = []
    # sampled external candidates (the reference enumerates the full N×N row;
    # uniform sampling reaches the same distribution without O(N^2) work)
    trials = 0
    while len(ext) < n_connect and trials < 50 * max(n_connect, 1):
        trials += 1
        i = int(rng.choice(targets))
        j = int(rng.integers(0, N))
        if i != j and y[i] != y[j] and i * N + j not in present:
            ext.append((i, j))
            present.add(i * N + j)
            present.add(j * N + i)
    flips = np.concatenate(
        [internal.reshape(-1, 2),
         np.asarray(ext, np.int64).reshape(-1, 2)], axis=0)
    return apply_edge_flips(graph, flips)


def rand_modification_attack(graph: Graph, n_edge_mod: int = 50,
                             seed: int = 0, mask=None) -> Graph:
    """RAND (reference rand.py:10): flip a random subset of target-incident
    edges."""
    rng = np.random.default_rng(seed)
    pairs = _target_incident_edges(graph, _target_ids(graph, mask))
    if pairs.shape[0] == 0:
        return graph
    pairs = pairs[rng.permutation(pairs.shape[0])]
    # dedupe undirected duplicates, keep first occurrence order
    seen, picked = set(), []
    for i, j in pairs:
        k = (min(i, j), max(i, j))
        if k in seen:
            continue
        seen.add(k)
        picked.append((i, j))
        if len(picked) >= n_edge_mod:
            break
    return apply_edge_flips(graph, np.asarray(picked, np.int64))


def _betweenness(graph: Graph, samples: int = 64, seed: int = 0) -> np.ndarray:
    """Brandes betweenness centrality, exact for small graphs and
    source-sampled above ``samples`` nodes (the reference calls networkx;
    same quantity)."""
    from ..data.sampling import graph_csr

    N = graph.num_nodes
    indptr, indices, _ = graph_csr(graph)
    rng = np.random.default_rng(seed)
    sources = (np.arange(N) if N <= samples
               else rng.choice(N, size=samples, replace=False))
    bc = np.zeros(N)
    for s in sources:
        # BFS
        dist = np.full(N, -1, np.int64)
        sigma = np.zeros(N)
        dist[s], sigma[s] = 0, 1.0
        order = [s]
        head = 0
        preds = [[] for _ in range(N)]
        while head < len(order):
            v = order[head]
            head += 1
            for u in indices[indptr[v]: indptr[v + 1]]:
                if dist[u] < 0:
                    dist[u] = dist[v] + 1
                    order.append(u)
                if dist[u] == dist[v] + 1:
                    sigma[u] += sigma[v]
                    preds[u].append(v)
        delta = np.zeros(N)
        for v in reversed(order):
            for p in preds[v]:
                delta[p] += sigma[p] / sigma[v] * (1.0 + delta[v])
            if v != s:
                bc[v] += delta[v]
    return bc * (N / max(len(sources), 1))


def _eigen_centrality(graph: Graph, iters: int = 100) -> np.ndarray:
    """Eigenvector centrality by power iteration (reference uses networkx)."""
    row, col = _coo(graph)
    N = graph.num_nodes
    x = np.ones(N) / np.sqrt(N)
    for _ in range(iters):
        nxt = np.zeros(N)
        np.add.at(nxt, row, x[col])
        n = np.linalg.norm(nxt)
        if n < 1e-12:
            break
        x = nxt / n
    return x


def flip_modification_attack(graph: Graph, n_edge_mod: int = 50,
                             flip_type: str = "deg", mode: str = "descend",
                             seed: int = 0, mask=None) -> Graph:
    """FLIP (reference flip.py:11): flip target-incident edges in
    centrality-score order — ``deg`` (endpoint degree sum), ``bet``
    (betweenness), ``eigen`` (eigenvector centrality)."""
    pairs = _target_incident_edges(graph, _target_ids(graph, mask))
    if pairs.shape[0] == 0:
        return graph
    if flip_type == "deg":
        row, _ = _coo(graph)
        deg = np.bincount(row, minlength=graph.num_nodes).astype(np.float64)
        score = deg[pairs[:, 0]] + deg[pairs[:, 1]]
    elif flip_type == "bet":
        c = _betweenness(graph, seed=seed)
        score = c[pairs[:, 0]] + c[pairs[:, 1]]
    elif flip_type == "eigen":
        c = _eigen_centrality(graph)
        score = c[pairs[:, 0]] + c[pairs[:, 1]]
    else:
        raise ValueError(f"unknown flip_type {flip_type!r}: deg | bet | eigen")
    if mode == "descend":
        score = -score
    elif mode != "ascend":
        raise ValueError("mode must be ascend | descend")
    order = np.argsort(score, kind="stable")
    seen, picked = set(), []
    for i, j in pairs[order]:
        k = (min(i, j), max(i, j))
        if k in seen:
            continue
        seen.add(k)
        picked.append((i, j))
        if len(picked) >= n_edge_mod:
            break
    return apply_edge_flips(graph, np.asarray(picked, np.int64))


def _generalized_eigen_scores(graph: Graph, pairs: np.ndarray,
                              kind: str) -> np.ndarray:
    """Shared NEA/STACK spectral machinery (reference nea.py:33, stack.py:31):
    generalized eigendecomposition of (A+I, D), then per-flip first-order
    eigenvalue perturbation estimates scored by the respective loss."""
    import scipy.linalg as spl

    N = graph.num_nodes
    row, col = _coo(graph)
    A = np.zeros((N, N))
    A[row, col] = 1.0
    A_ = A + np.eye(N)
    D = np.diag(A_.sum(1))
    vals, vecs = spl.eigh(A_, D)
    flip_ind = 1.0 - 2.0 * A[pairs[:, 0], pairs[:, 1]]
    scores = np.zeros(pairs.shape[0])
    sub_org = np.sqrt(np.sum(vals ** 2))
    for k in range(pairs.shape[0]):
        i, j = pairs[k]
        est = vals + flip_ind[k] * (
            2 * vecs[i] * vecs[j] - vals * (vecs[i] ** 2 + vecs[j] ** 2))
        if kind == "nea":
            powers = sum(np.power(est, p) for p in range(1, 6))
            trunc = np.sort(powers ** 2)[: max(N - 32, 1)]
            scores[k] = -np.sqrt(np.sum(trunc))
        else:  # stack
            scores[k] = -np.abs(sub_org - np.sqrt(np.sum(est ** 2)))
    return scores


def _flip_by_scores(graph: Graph, pairs: np.ndarray, scores: np.ndarray,
                    n_edge_mod: int) -> Graph:
    order = np.argsort(scores, kind="stable")
    seen, picked = set(), []
    for i, j in pairs[order]:
        k = (min(i, j), max(i, j))
        if k in seen:
            continue
        seen.add(k)
        picked.append((i, j))
        if len(picked) >= n_edge_mod:
            break
    return apply_edge_flips(graph, np.asarray(picked, np.int64))


def nea_modification_attack(graph: Graph, n_edge_mod: int = 50) -> Graph:
    """NEA — node-embedding poisoning via spectral perturbation (reference
    nea.py:11). Dense generalized eigendecomposition like the reference:
    O(N^3), intended for the GRB small/medium settings."""
    pairs = _target_incident_edges(graph, _target_ids(graph))
    if pairs.shape[0] == 0:
        return graph
    return _flip_by_scores(graph, pairs,
                           _generalized_eigen_scores(graph, pairs, "nea"),
                           n_edge_mod)


def stack_modification_attack(graph: Graph, n_edge_mod: int = 50) -> Graph:
    """STACK spectral attack (reference stack.py:11)."""
    pairs = _target_incident_edges(graph, _target_ids(graph))
    if pairs.shape[0] == 0:
        return graph
    return _flip_by_scores(graph, pairs,
                           _generalized_eigen_scores(graph, pairs, "stack"),
                           n_edge_mod)


# ---------------------------------------------------------------------------
# Gradient attacks on the edge-weight parametrisation (FGA, PRBCD)
# ---------------------------------------------------------------------------

def _union_graph(graph: Graph, cand: np.ndarray):
    """Build the statically shaped attack program inputs: the real edges plus
    a candidate block (both directions), a bool vector marking candidates
    that already exist (their real twin is weighted ``1 - w`` during the
    relaxation), and the un-normalised base weights."""
    N = graph.num_nodes
    row, col = _coo(graph)
    present = _edge_set(row, col, N)
    exists = np.array([i * N + j in present for i, j in cand], bool)
    # real-edge slots colliding with an existing candidate
    key_to_slot = {}
    keys = row * N + col
    for s, k in enumerate(keys.tolist()):
        key_to_slot[k] = s
    twin = np.full(cand.shape[0], -1, np.int64)
    for c, (i, j) in enumerate(cand):
        if exists[c]:
            twin[c] = key_to_slot[i * N + j]
    return row, col, exists, twin


def _relaxed_forward_loss(model_apply, variables, graph: Graph,
                          cand: np.ndarray, targets: np.ndarray,
                          labels: jnp.ndarray, loss_kind: str = "ce"):
    """Differentiable map w ∈ [0,1]^k → attack loss on the targets.

    The modified adjacency is the real edge list with colliding edges
    re-weighted ``1 - w`` plus the candidate block at ``w`` (symmetrised),
    sym-normalised in-graph (Â = D^-1/2 (A+I) D^-1/2 — the normalisation the
    defended models use) so gradients flow through the degree terms too, as
    in the reference's dense ``adj_norm_func`` differentiation (fga.py:64,
    prbcd.py:183)."""
    from .. data.graph import _bucket

    N = graph.num_nodes
    row, col, exists, twin = _union_graph(graph, cand)
    E = row.shape[0]
    # union COO in CONCAT order: real edges + candidate fwd + candidate rev
    # + missing self loops (the relaxation works on the binary adjacency)
    ar, ac = cand[:, 0], cand[:, 1]
    has_loop = np.zeros(N, bool)
    has_loop[row[row == col]] = True
    loops = np.nonzero(~has_loop)[0].astype(np.int64)
    u_row = np.concatenate([row, ar, ac, loops])
    u_col = np.concatenate([col, ac, ar, loops])
    E_u = u_row.shape[0]
    # sorted CSR view for the model; weights are built in concat order and
    # permuted by this static gather (from_coo would lose the alignment)
    order = np.lexsort((u_col, u_row))
    n_pad = graph.n_pad
    sink = n_pad - 1
    e_pad = _bucket(E_u)
    row_s = np.full(e_pad, sink, np.int32)
    col_s = np.full(e_pad, sink, np.int32)
    row_s[:E_u] = u_row[order]
    col_s[:E_u] = u_col[order]
    counts = np.bincount(row_s, minlength=n_pad)
    row_ptr = np.zeros(n_pad + 1, np.int32)
    np.cumsum(counts, out=row_ptr[1:])
    meta_d = dict(graph.meta)
    meta_d["norm"] = "sym"  # weights arrive normalised below
    base_graph = Graph(
        row_ptr=jnp.asarray(row_ptr), row=jnp.asarray(row_s),
        col=jnp.asarray(col_s),
        edge_weight=jnp.zeros(e_pad, jnp.float32),
        num_nodes=N, num_edges=int(E_u), x=graph.x, y=graph.y,
        train_mask=graph.train_mask, val_mask=graph.val_mask,
        test_mask=graph.test_mask, meta=tuple(sorted(meta_d.items())))

    tmask = jnp.zeros(N, bool).at[jnp.asarray(targets)].set(True)
    u_row_j = jnp.asarray(u_row, jnp.int32)
    u_col_j = jnp.asarray(u_col, jnp.int32)
    order_j = jnp.asarray(order, jnp.int32)
    exists_j = jnp.asarray(exists)
    twin_j = jnp.asarray(np.where(twin >= 0, twin, 0), jnp.int32)
    has_twin = jnp.asarray(twin >= 0)

    def loss_fn(w):
        w = jnp.clip(w, 0.0, 1.0)
        real_w = jnp.ones(E)
        # existing candidates relax their real twin to 1 - w
        real_w = real_w.at[twin_j].add(jnp.where(has_twin, -w, 0.0))
        cand_w = jnp.where(exists_j, 0.0, w)  # absent candidates enter at w
        uw = jnp.concatenate(
            [real_w, cand_w, cand_w, jnp.ones(loops.shape[0])])
        # symmetric normalisation, differentiable through the degrees
        deg = jax.ops.segment_sum(uw, u_row_j, N)
        dinv = jax.lax.rsqrt(jnp.maximum(deg, 1e-12))
        uw_n = uw * dinv[u_row_j] * dinv[u_col_j]
        w_pad = jnp.concatenate(
            [uw_n[order_j], jnp.zeros(e_pad - E_u)])
        g = base_graph.replace(edge_weight=w_pad)
        logits = model_apply(variables, g)[:N]
        if loss_kind == "tanh_margin":
            # PRBCD's surrogate loss (prbcd.py:24): tanh of the negative
            # classification margin on the targets
            true = jnp.take_along_axis(logits, labels[:, None], 1)[:, 0]
            masked = logits.at[jnp.arange(N), labels].add(-1e9)
            best_other = masked.max(-1)
            margin = true - best_other
            per = jnp.tanh(-margin / 40.0)
        else:
            logp = jax.nn.log_softmax(logits, -1)
            per = -jnp.take_along_axis(logp, labels[:, None], 1)[:, 0]
        m = tmask.astype(per.dtype)
        return jnp.sum(per * m) / jnp.maximum(m.sum(), 1.0)

    return loss_fn, exists


def _predicted_labels(model_apply, variables, graph: Graph) -> jnp.ndarray:
    logits = model_apply(variables, graph)
    return jnp.argmax(logits[: graph.num_nodes], -1).astype(jnp.int32)


def fga_modification_attack(model_apply, variables, graph: Graph,
                            n_edge_mod: int = 50, n_candidates: int = 2048,
                            seed: int = 0, mask=None) -> Graph:
    """FGA — Fast Gradient Attack (reference fga.py:11). Greedy loop: take
    the gradient of the target loss wrt the flip relaxation and flip the
    highest-gradient candidate each round. The reference densifies the
    adjacency to get d(loss)/d(A_ij) for ALL pairs; here the gradient is
    over a sampled candidate block (target-incident pairs + random
    (target, non-neighbor) pairs) — O(E + k) memory instead of O(N²),
    same greedy rule."""
    rng = np.random.default_rng(seed)
    N = graph.num_nodes
    targets = _target_ids(graph, mask)
    labels = _predicted_labels(model_apply, variables, graph)
    inc = _target_incident_edges(graph, targets)
    n_rand = max(n_candidates - inc.shape[0], n_candidates // 2)
    rnd = np.stack([rng.choice(targets, n_rand),
                    rng.integers(0, N, n_rand)], axis=1)
    rnd = rnd[rnd[:, 0] != rnd[:, 1]]
    cand = np.concatenate([inc, rnd])
    # canonical (min, max) orientation: both orders of one undirected pair
    # must occupy a single relaxation slot (the block symmetrises itself)
    cand = np.unique(np.stack([cand.min(1), cand.max(1)], axis=1), axis=0)

    loss_fn, exists = _relaxed_forward_loss(
        model_apply, variables, graph, cand, targets, labels)
    grad_fn = jax.jit(jax.grad(loss_fn))
    w = jnp.zeros(cand.shape[0])
    flipped = np.zeros(cand.shape[0], bool)
    picked = []
    for _ in range(n_edge_mod):
        g = np.asarray(grad_fn(w))
        # w parametrises "apply the flip" for present AND absent candidates
        # (absent enters at w, a present one's twin is weighted 1-w), so the
        # gradient is directly the first-order gain of each flip
        gain = g.copy()
        gain[flipped] = -np.inf  # each candidate flips at most once
        c = int(np.argmax(gain))
        if not np.isfinite(gain[c]) or gain[c] <= 0:
            break
        flipped[c] = True
        picked.append(cand[c])
        # committed flip: absent→present enters at w=1; present→absent sets
        # the twin's relaxed weight 1-w to 0 — both are w=1
        w = w.at[c].set(1.0)
    if not picked:
        return graph
    return apply_edge_flips(graph, np.asarray(picked, np.int64))


def prbcd_modification_attack(model_apply, variables, graph: Graph,
                              n_edge_mod: int = 50,
                              block_size: int = 4096,
                              n_epoch: int = 40,
                              resample_every: Optional[int] = None,
                              lr: float = 0.2,
                              final_samples: int = 10,
                              seed: int = 0, mask=None) -> Graph:
    """PRBCD — Projected Randomized Block Coordinate Descent (reference
    prbcd.py:32). Relax edge flips to weights on a random candidate block,
    run projected gradient ascent on the tanh-margin loss, periodically
    resample the low-weight half of the block, then discretise by top-k +
    Bernoulli sampling and keep the sample with the lowest surrogate
    accuracy. Statically shaped: the block size is fixed, so every epoch
    reuses one compiled gradient program even across resamples."""
    rng = np.random.default_rng(seed)
    N = graph.num_nodes
    targets = _target_ids(graph, mask)
    labels = _predicted_labels(model_apply, variables, graph)
    n_resample = (int(0.75 * n_epoch) if resample_every is None
                  else resample_every)

    def draw(k):
        c = np.stack([rng.integers(0, N, k), rng.integers(0, N, k)], axis=1)
        c = c[c[:, 0] != c[:, 1]]
        # canonical undirected orientation (one slot per pair)
        return np.stack([c.min(1), c.max(1)], axis=1)

    def top_up(cand):
        while cand.shape[0] < block_size:
            cand = np.unique(
                np.concatenate([cand, draw(block_size - cand.shape[0] + 16)]),
                axis=0)
        return cand[:block_size]

    cand = top_up(draw(block_size + block_size // 4))
    eps = 1e-7
    w = np.full(block_size, eps, np.float32)

    def project(w):
        v = np.clip(w, 0.0, 1.0)
        if v.sum() <= n_edge_mod:
            return np.clip(w, eps, 1.0 - eps)
        lo, hi = float(w.min() - 1.0), float(w.max())
        for _ in range(60):  # bisection on the simplex shift (prbcd.py:447)
            mid = (lo + hi) / 2
            s = np.clip(w - mid, 0.0, 1.0).sum()
            if s > n_edge_mod:
                lo = mid
            else:
                hi = mid
        return np.clip(w - hi, eps, 1.0 - eps)

    # one compiled grad/loss program per block geometry (shapes fixed)
    def build(cand):
        loss_fn, exists = _relaxed_forward_loss(
            model_apply, variables, graph, cand, targets, labels,
            loss_kind="tanh_margin")
        return jax.jit(jax.value_and_grad(loss_fn)), loss_fn, exists

    vg, loss_fn, exists = build(cand)
    lr_eff = lr * max(n_edge_mod, 1)
    for epoch in range(n_epoch):
        loss, g = vg(jnp.asarray(w))
        step = lr_eff / np.sqrt(max(0, epoch - n_resample) + 1)
        w = w + step * np.asarray(g)
        w = project(w)
        if epoch < n_resample - 1:
            # resample the low-weight half of the block
            order = np.argsort(w)
            keep = order[block_size // 2:]
            kept_c, kept_w = cand[keep], w[keep]
            cand = top_up(np.unique(
                np.concatenate([kept_c, draw(block_size)]), axis=0))
            w2 = np.full(block_size, eps, np.float32)
            key = {(int(i), int(j)): v
                   for (i, j), v in zip(kept_c, kept_w)}
            for s, (i, j) in enumerate(cand):
                v = key.get((int(i), int(j)))
                if v is not None:
                    w2[s] = v
            w = w2
            vg, loss_fn, exists = build(cand)

    # discretise (prbcd.py sample_final_edges): top-k first, then Bernoulli
    eval_loss = jax.jit(loss_fn)
    best = (-np.inf, None)
    for t in range(final_samples):
        if t == 0:
            s = np.zeros(block_size, np.float32)
            s[np.argsort(w)[-n_edge_mod:]] = 1.0
        else:
            s = (rng.random(block_size) < np.clip(w, 0, 1)).astype(np.float32)
            if s.sum() > n_edge_mod:
                continue
        val = float(eval_loss(jnp.asarray(s)))
        if val > best[0]:
            best = (val, s)
    s = best[1]
    picked = cand[s > 0.5]
    if picked.shape[0] == 0:
        return graph
    return apply_edge_flips(graph, picked.astype(np.int64))


def pgd_modification_attack(model_apply, variables, graph: Graph,
                            n_edge_mod: int = 50, n_node_mod: int = 50,
                            epsilon: float = 0.1, steps: int = 10,
                            step_size: float = 0.02,
                            seed: int = 0, mask=None) -> Graph:
    """Joint structure+feature PGD (reference modification/pgd.py:13):
    random edge flips around the targets, then PGD feature optimisation of
    a random subset of ``n_node_mod`` target nodes on the modified graph."""
    from .grb import pgd_attack_features

    g2 = rand_modification_attack(graph, n_edge_mod, seed=seed, mask=mask)
    rng = np.random.default_rng(seed + 1)
    targets = _target_ids(graph, mask)
    if targets.size == 0:
        return g2
    mod = rng.choice(targets, size=min(n_node_mod, targets.size),
                     replace=False)
    fmask = jnp.zeros(g2.n_pad, bool).at[jnp.asarray(mod)].set(True)
    return pgd_attack_features(model_apply, variables, g2, epsilon=epsilon,
                               steps=steps, step_size=step_size, mask=fmask)
