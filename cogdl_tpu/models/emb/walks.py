"""Vectorised random walks + jitted skip-gram with negative sampling.

Replaces the reference's OpenMP walker (cogdl/utils/rwalk/rwalk.c) and
gensim Word2Vec (cogdl/models/emb/deepwalk.py:11) with a numpy batch walker
and a TPU-friendly SGNS trained by jit-compiled minibatch steps (all matmuls).
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

from ...data.graph import Graph


def build_csr(graph: Graph) -> Tuple[np.ndarray, np.ndarray]:
    """(indptr, indices) over real edges, symmetrised."""
    from .base import graph_to_scipy

    A = graph_to_scipy(graph)
    return A.indptr.astype(np.int64), A.indices.astype(np.int64)


def random_walks(
    indptr: np.ndarray,
    indices: np.ndarray,
    num_walks: int,
    walk_length: int,
    seed: int = 0,
    p_restart: float = 0.0,
) -> np.ndarray:
    """Uniform random walks, vectorised over all starts at once
    (reference rwalk.c:7-38 semantics). Dispatches to the native C++/OpenMP
    walker (cogdl_tpu.native) when built, numpy otherwise."""
    rng = np.random.default_rng(seed)
    N = indptr.shape[0] - 1
    starts = np.tile(np.arange(N), num_walks)
    from ... import native

    if native.available():
        return native.random_walk(indptr, indices, starts, walk_length,
                                  restart_prob=p_restart, seed=seed)
    walks = np.empty((starts.shape[0], walk_length), np.int64)
    walks[:, 0] = starts
    cur = starts.copy()
    deg = np.diff(indptr)
    for t in range(1, walk_length):
        d = deg[cur]
        # uniform neighbor choice; isolated nodes stay put. The gather
        # position is CLIPPED before indexing: a trailing isolated node has
        # indptr[cur] == len(indices) and the d>0 mask only applies after.
        off = (rng.random(cur.shape[0]) * np.maximum(d, 1)).astype(np.int64)
        pos = np.minimum(indptr[cur] + np.minimum(off, np.maximum(d - 1, 0)),
                         max(indices.shape[0] - 1, 0))
        nxt = indices[pos] if indices.size else cur
        nxt = np.where(d > 0, nxt, cur)
        if p_restart > 0:
            restart = rng.random(cur.shape[0]) < p_restart
            nxt = np.where(restart, starts, nxt)
        walks[:, t] = nxt
        cur = nxt
    return walks


def node2vec_walks(
    indptr: np.ndarray,
    indices: np.ndarray,
    num_walks: int,
    walk_length: int,
    p: float = 1.0,
    q: float = 1.0,
    seed: int = 0,
) -> np.ndarray:
    """Biased 2nd-order walks (node2vec) via rejection sampling — vectorised
    (the standard trick: accept/reject against max(1, 1/p, 1/q))."""
    rng = np.random.default_rng(seed)
    N = indptr.shape[0] - 1
    starts = np.tile(np.arange(N), num_walks)
    W = starts.shape[0]
    walks = np.empty((W, walk_length), np.int64)
    walks[:, 0] = starts
    deg = np.diff(indptr)
    if walk_length == 1:
        return walks
    # first hop uniform (clipped gather: trailing isolated nodes have
    # indptr[start] == len(indices))
    d = deg[starts]
    off = (rng.random(W) * np.maximum(d, 1)).astype(np.int64)
    pos = np.minimum(indptr[starts] + np.minimum(off, np.maximum(d - 1, 0)),
                     max(indices.shape[0] - 1, 0))
    cur = np.where(d > 0, indices[pos] if indices.size else starts, starts)
    walks[:, 1] = cur
    prev = starts.copy()
    inv_p, inv_q = 1.0 / p, 1.0 / q
    upper = max(1.0, inv_p, inv_q)
    for t in range(2, walk_length):
        d = deg[cur]
        nxt = cur.copy()
        active = d > 0
        tries = 0
        todo = active.copy()
        while todo.any() and tries < 12:
            idxs = np.nonzero(todo)[0]
            dd = d[idxs]
            off = (rng.random(idxs.shape[0]) * dd).astype(np.int64)
            cand = indices[indptr[cur[idxs]] + off]
            # bias weight: back to prev → 1/p; neighbor of prev → 1; else 1/q
            w = np.full(idxs.shape[0], inv_q)
            w[cand == prev[idxs]] = inv_p
            # neighbor-of-prev test (sorted indices per row): searchsorted
            lo = indptr[prev[idxs]]
            hi = indptr[prev[idxs] + 1]
            pos = np.array([np.searchsorted(indices[l:h], c) + l
                            for l, h, c in zip(lo, hi, cand)])
            is_nbr = (pos < hi) & (indices[np.minimum(pos, indices.shape[0] - 1)] == cand)
            w[is_nbr & (cand != prev[idxs])] = 1.0
            accept = rng.random(idxs.shape[0]) < (w / upper)
            acc_idx = idxs[accept]
            nxt[acc_idx] = cand[accept]
            todo[acc_idx] = False
            tries += 1
        # any leftovers: uniform
        left = np.nonzero(todo)[0]
        if left.size:
            dd = d[left]
            off = (rng.random(left.shape[0]) * np.maximum(dd, 1)).astype(np.int64)
            nxt[left] = indices[indptr[cur[left]] + np.minimum(off, np.maximum(dd - 1, 0))]
        prev, cur = cur, nxt
        walks[:, t] = cur
    return walks


def walks_to_pairs(walks: np.ndarray, window: int, seed: int = 0,
                   max_pairs: Optional[int] = None) -> np.ndarray:
    """(center, context) pairs from walks within the window."""
    rng = np.random.default_rng(seed)
    pairs = []
    L = walks.shape[1]
    for off in range(1, window + 1):
        if off >= L:
            break
        pairs.append(np.stack([walks[:, :-off].ravel(), walks[:, off:].ravel()], 1))
        pairs.append(np.stack([walks[:, off:].ravel(), walks[:, :-off].ravel()], 1))
    P = np.concatenate(pairs, 0)
    rng.shuffle(P)
    if max_pairs is not None and P.shape[0] > max_pairs:
        P = P[:max_pairs]
    return P


def train_sgns(
    pairs: np.ndarray,
    num_nodes: int,
    dim: int = 128,
    num_negative: int = 5,
    batch_size: int = 65536,
    epochs: int = 2,
    lr: float = 0.025,
    seed: int = 0,
    tie_context: bool = False,
) -> np.ndarray:
    """Skip-gram with negative sampling, jit-stepped on device.

    ``tie_context=True`` scores contexts/negatives against the SAME vertex
    table (first-order proximity — LINE order 1, reference line.py:124
    updates ``emb_vertex`` for both endpoints)."""
    import jax
    import jax.numpy as jnp
    import optax

    rng = np.random.default_rng(seed)
    key = jax.random.PRNGKey(seed)
    emb_in = jax.random.normal(key, (num_nodes, dim)) * (1.0 / dim)
    emb_out = jnp.zeros((num_nodes, dim))
    tx = optax.adam(lr)
    params = {"in": emb_in, "out": emb_out}
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, centers, contexts, negatives):
        def loss_fn(p):
            ctx = p["in"] if tie_context else p["out"]
            c = p["in"][centers]                       # [B, D]
            pos = jnp.sum(c * ctx[contexts], -1)
            neg = jnp.einsum("bd,bkd->bk", c, ctx[negatives])
            lsig = jax.nn.log_sigmoid   # stable (hand-rolled log1p(exp)
            # overflows once embedding norms grow)
            return -(jnp.mean(lsig(pos)) + jnp.mean(lsig(-neg)))

        loss, grads = jax.value_and_grad(loss_fn)(params)
        upd, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, upd), opt_state, loss

    n = pairs.shape[0]
    # clamp so the wrap-pad below can always reach a full static batch
    # (with fewer than batch_size/2 pairs one perm[:k] pad is too short)
    batch_size = min(batch_size, n)
    nb = max(n // batch_size, 1)
    for ep in range(epochs):
        perm = rng.permutation(n)
        for b in range(nb):
            sl = perm[b * batch_size: (b + 1) * batch_size]
            if sl.shape[0] < batch_size:  # keep shapes static
                sl = np.concatenate([sl, perm[: batch_size - sl.shape[0]]])
            centers = pairs[sl, 0]
            contexts = pairs[sl, 1]
            negatives = rng.integers(0, num_nodes,
                                     (batch_size, num_negative))
            params, opt_state, _ = step(params, opt_state,
                                        jnp.asarray(centers),
                                        jnp.asarray(contexts),
                                        jnp.asarray(negatives))
    return np.asarray(params["in"])
