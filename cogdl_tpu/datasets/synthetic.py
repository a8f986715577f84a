"""Synthetic graph generators — deterministic datasets for tests, benchmarks,
and offline development (no network egress required).

The reference ships ``generate_random_graph`` for customized data
(cogdl/datasets/customized_data.py:149); we extend that idea into full dataset
stand-ins: stochastic block models with informative features (so models can
actually learn), power-law graphs at OGB scale for SpMM benchmarking, random
multi-graph sets for graph classification, and random KG triple sets.
"""

from __future__ import annotations

import functools
from typing import List, Optional, Tuple

import numpy as np

from ..data.graph import Graph, add_self_loops, from_coo, to_undirected
from ..data.graph import _round_up as _ru


def sbm_graph(
    num_nodes: int = 400,
    num_classes: int = 4,
    p_in: float = 0.05,
    p_out: float = 0.005,
    feat_dim: int = 32,
    feat_noise: float = 1.0,
    train_ratio: float = 0.3,
    val_ratio: float = 0.2,
    seed: int = 0,
    self_loops: bool = True,
) -> Graph:
    """Stochastic block model with class-informative Gaussian features.

    A GCN should reach high accuracy here; used as the Cora stand-in when real
    Planetoid files are unavailable.
    """
    rng = np.random.default_rng(seed)
    y = rng.integers(0, num_classes, size=num_nodes)
    # efficient SBM sampling: sample edge counts per block pair
    rows, cols = [], []
    for a in range(num_classes):
        ia = np.where(y == a)[0]
        for b in range(num_classes):
            ib = np.where(y == b)[0]
            p = p_in if a == b else p_out
            n_possible = len(ia) * len(ib)
            k = rng.binomial(n_possible, p)
            if k == 0:
                continue
            r = rng.choice(ia, size=k)
            c = rng.choice(ib, size=k)
            rows.append(r)
            cols.append(c)
    row = np.concatenate(rows) if rows else np.zeros(0, np.int64)
    col = np.concatenate(cols) if cols else np.zeros(0, np.int64)
    keep = row != col
    row, col = row[keep], col[keep]

    centers = rng.normal(size=(num_classes, feat_dim)) * 2.0
    x = centers[y] + rng.normal(size=(num_nodes, feat_dim)) * feat_noise
    x = x.astype(np.float32)

    perm = rng.permutation(num_nodes)
    n_train = int(train_ratio * num_nodes)
    n_val = int(val_ratio * num_nodes)
    train_mask = np.zeros(num_nodes, bool)
    val_mask = np.zeros(num_nodes, bool)
    test_mask = np.zeros(num_nodes, bool)
    train_mask[perm[:n_train]] = True
    val_mask[perm[n_train: n_train + n_val]] = True
    test_mask[perm[n_train + n_val:]] = True

    g = from_coo(
        np.stack([row, col]),
        num_nodes=num_nodes,
        x=x,
        y=y.astype(np.int32),
        train_mask=train_mask,
        val_mask=val_mask,
        test_mask=test_mask,
        meta={"num_classes": num_classes, "name": f"sbm{num_nodes}"},
    )
    g = to_undirected(g)
    if self_loops:
        g = add_self_loops(g)
    return g


def _relabel_coo(row, col, num_nodes: int, method: str, seed: int = 0):
    """Host-side node relabeling of a COO edge list (pre-device-transfer
    companion of data.graph.reorder — the tunneled device link makes
    post-hoc permutation of resident arrays impractical). The permutation
    itself is shared with ``data.graph.reorder``."""
    from ..data.graph import reorder_permutation

    perm = reorder_permutation(np.asarray(row, np.int64),
                               np.asarray(col, np.int64),
                               num_nodes, method, seed)
    rank = np.empty(num_nodes, np.int64)
    rank[perm] = np.arange(num_nodes)
    return rank[row], rank[col]


def powerlaw_graph(
    num_nodes: int,
    avg_degree: int = 15,
    feat_dim: int = 128,
    num_classes: int = 47,
    seed: int = 0,
    device_features: bool = False,
    relabel=None,
) -> Graph:
    """Preferential-attachment-style power-law graph at arbitrary scale —
    the SpMM benchmark workload (ogbn-products stand-in). Degree distribution
    is drawn from a Zipf law over destination popularity.

    ``device_features=True`` generates x/y/masks directly on the default
    device (skips the host→device transfer of the feature matrix — this
    environment's device link is slow)."""
    rng = np.random.default_rng(seed)
    num_edges = num_nodes * avg_degree
    # popularity-weighted destinations: Zipf ranks
    ranks = np.arange(1, num_nodes + 1, dtype=np.float64)
    probs = ranks ** -0.8
    probs /= probs.sum()
    col = rng.choice(num_nodes, size=num_edges, p=probs).astype(np.int64)
    row = rng.integers(0, num_nodes, size=num_edges).astype(np.int64)
    if relabel:
        # note: ids are BORN degree-ordered (Zipf rank = id), so
        # relabel="random" simulates an arbitrary real-world labeling and
        # ["random", "degree"] tests recovery
        for method in ([relabel] if isinstance(relabel, str) else relabel):
            row, col = _relabel_coo(row, col, num_nodes, method, seed)
    if device_features:
        g = from_coo(
            np.stack([row, col]), num_nodes=num_nodes,
            meta={"num_classes": num_classes, "name": f"powerlaw{num_nodes}"},
        )
        import jax
        import jax.numpy as jnp

        key = jax.random.PRNGKey(seed)
        k1, k2, k3 = jax.random.split(key, 3)
        x = jax.random.normal(k1, (g.n_pad, feat_dim), jnp.float32)
        y = jax.random.randint(k2, (g.n_pad,), 0, num_classes, jnp.int32)
        train_mask = (jax.random.uniform(k3, (g.n_pad,)) < 0.1) & g.node_mask()
        return g.replace(x=x, y=y, train_mask=train_mask,
                         val_mask=~train_mask & g.node_mask(),
                         test_mask=~train_mask & g.node_mask())
    x = rng.normal(size=(num_nodes, feat_dim)).astype(np.float32)
    y = rng.integers(0, num_classes, size=num_nodes).astype(np.int32)
    train_mask = rng.uniform(size=num_nodes) < 0.1
    g = from_coo(
        np.stack([row, col]),
        num_nodes=num_nodes,
        x=x,
        y=y,
        train_mask=train_mask,
        val_mask=~train_mask,
        test_mask=~train_mask,
        meta={"num_classes": num_classes, "name": f"powerlaw{num_nodes}"},
    )
    return g


def powerlaw_graph_device(
    num_nodes: int,
    avg_degree: int = 15,
    feat_dim: int = 128,
    num_classes: int = 47,
    seed: int = 0,
    undirected: bool = True,
    zipf_a: float = 0.8,
    pad_multiple: int = 128,
) -> Graph:
    """Fully device-resident power-law graph at OGB scale (ogbn-products
    stand-in for the ≥1M-node benchmarks).

    Everything — edge sampling, CSR sort, row_ptr, sym-normalisation,
    features — is generated on the accelerator; the only host→device
    transfer is the [N] Zipf CDF (float32, ~10 MB at 2.45M nodes). This
    matters because this environment's host↔device link runs at single-digit
    MB/s: shipping a 124M-edge COO list would take longer than training.

    ``undirected=True`` mirrors every sampled edge, giving Aᵀ = A so the
    backward SpMM can reuse the forward kernel layout
    (``prepare_spmm_device(symmetric=True)``) — and matching ogbn-products,
    which is undirected.
    """
    import jax
    import jax.numpy as jnp

    n_pad = _ru(num_nodes, pad_multiple)
    n_directed = (num_nodes * avg_degree) // (2 if undirected else 1)

    # host: Zipf popularity CDF over destination ranks (f64 for the cumsum)
    ranks = np.arange(1, num_nodes + 1, dtype=np.float64)
    probs = ranks ** -zipf_a
    cdf = jnp.asarray(np.cumsum(probs / probs.sum()), jnp.float32)

    key = jax.random.PRNGKey(seed)
    ku, kr, kx, ky, km = jax.random.split(key, 5)

    @functools.partial(jax.jit, static_argnums=(2, 3, 4))
    def gen(ku, kr, n_directed, num_nodes, undirected):
        u = jax.random.uniform(ku, (n_directed,))
        dst = jnp.searchsorted(cdf, u).astype(jnp.int32)
        dst = jnp.minimum(dst, num_nodes - 1)
        src = jax.random.randint(kr, (n_directed,), 0, num_nodes, jnp.int32)
        if undirected:
            row = jnp.concatenate([dst, src])
            col = jnp.concatenate([src, dst])
        else:
            row, col = dst, src
        loops = jnp.arange(num_nodes, dtype=jnp.int32)
        row = jnp.concatenate([row, loops])
        col = jnp.concatenate([col, loops])
        row, col = jax.lax.sort((row, col), num_keys=1, is_stable=True)
        row_ptr = jnp.searchsorted(
            row, jnp.arange(n_pad + 1, dtype=jnp.int32)).astype(jnp.int32)
        # symmetric normalisation folded into edge weights (GCN D^-1/2AD^-1/2)
        deg = jax.ops.segment_sum(jnp.ones_like(row, jnp.float32), row,
                                  num_segments=n_pad,
                                  indices_are_sorted=True)
        inv_sqrt = jnp.where(deg > 0, jax.lax.rsqrt(jnp.maximum(deg, 1e-12)),
                             0.0)
        w = jnp.take(inv_sqrt, row) * jnp.take(inv_sqrt, col)
        return row, col, w, row_ptr

    row, col, w, row_ptr = gen(ku, kr, n_directed, num_nodes, undirected)
    E = int(row.shape[0])

    x = jax.random.normal(kx, (n_pad, feat_dim), jnp.float32)
    y = jax.random.randint(ky, (n_pad,), 0, num_classes, jnp.int32)
    node_ok = jnp.arange(n_pad, dtype=jnp.int32) < num_nodes
    train_mask = (jax.random.uniform(km, (n_pad,)) < 0.1) & node_ok

    return Graph(
        row_ptr=row_ptr, row=row, col=col, edge_weight=w,
        num_nodes=num_nodes, num_edges=E,
        x=x, y=y, train_mask=train_mask,
        val_mask=~train_mask & node_ok, test_mask=~train_mask & node_ok,
        meta=tuple(sorted({
            "num_classes": num_classes, "norm": "sym", "self_loops": True,
            "symmetric": bool(undirected),
            "name": f"powerlaw{num_nodes}-dev"}.items())),
    )


def random_graphs_dataset(
    num_graphs: int = 60,
    min_nodes: int = 10,
    max_nodes: int = 30,
    num_classes: int = 2,
    feat_dim: int = 8,
    seed: int = 0,
) -> Tuple[List[Graph], np.ndarray]:
    """Multi-graph classification set: class 0 = sparse ER graphs, class 1 =
    dense ER graphs (learnable from mean degree). MUTAG stand-in."""
    rng = np.random.default_rng(seed)
    graphs, labels = [], []
    for i in range(num_graphs):
        label = i % num_classes
        n = int(rng.integers(min_nodes, max_nodes + 1))
        p = 0.15 + 0.3 * label / max(1, num_classes - 1)
        mask = rng.uniform(size=(n, n)) < p
        np.fill_diagonal(mask, False)
        r, c = np.where(mask | mask.T)
        x = rng.normal(size=(n, feat_dim)).astype(np.float32)
        g = from_coo(np.stack([r, c]), num_nodes=n, x=x,
                     meta={"num_classes": num_classes})
        g = add_self_loops(g)
        graphs.append(g.replace(y=np.full(g.n_pad, label, np.int32)))
        labels.append(label)
    return graphs, np.asarray(labels, np.int32)


def traffic_graph(
    num_nodes: int = 50,
    num_steps: int = 400,
    feat_dim: int = 1,
    seed: int = 0,
) -> Graph:
    """Traffic time-series stand-in (PeMS-style): road-network graph +
    smooth periodic per-node series diffused over the graph, stored in
    ``extras['series']`` [T, N, C]."""
    import jax.numpy as jnp

    rng = np.random.default_rng(seed)
    # ring-of-neighborhood road graph
    rows, cols = [], []
    for v in range(num_nodes):
        for d in (1, 2):
            rows += [v, (v + d) % num_nodes]
            cols += [(v + d) % num_nodes, v]
    g = from_coo(np.stack([np.asarray(rows), np.asarray(cols)]),
                 num_nodes=num_nodes,
                 meta={"name": f"traffic{num_nodes}", "num_classes": 1})
    t = np.arange(num_steps)[:, None]
    phase = rng.uniform(0, 2 * np.pi, num_nodes)[None, :]
    base = (np.sin(2 * np.pi * t / 48 + phase)
            + 0.5 * np.sin(2 * np.pi * t / 12 + 2 * phase))
    noise = 0.1 * rng.normal(size=(num_steps, num_nodes))
    series = (base + noise).astype(np.float32)[..., None]
    if feat_dim > 1:
        series = np.repeat(series, feat_dim, axis=-1)
    # pad the node axis to the graph's static size (spmm operates on n_pad)
    series = np.concatenate(
        [series, np.zeros((num_steps, g.n_pad - num_nodes, series.shape[-1]),
                          np.float32)], axis=1)
    x = np.zeros((num_nodes, 1), np.float32)
    g = g.replace(x=jnp.asarray(np.concatenate(
        [x, np.zeros((g.n_pad - num_nodes, 1), np.float32)])))
    return g.replace(extras={"series": jnp.asarray(series)})


def hetero_sbm_graph(
    num_nodes: int = 300,
    num_types: int = 3,
    num_classes: int = 3,
    num_metapaths: int = 2,
    feat_dim: int = 16,
    seed: int = 0,
) -> Graph:
    """Heterogeneous stand-in (ACM/DBLP-style): typed nodes, typed edges, and
    per-metapath adjacency graphs in ``extras['metapath_graphs']`` /
    ``extras['relation_graphs']`` — drives HAN/GTN/RGCN/metapath2vec."""
    import jax.numpy as jnp

    base = sbm_graph(num_nodes=num_nodes, num_classes=num_classes,
                     feat_dim=feat_dim, seed=seed, self_loops=False)
    rng = np.random.default_rng(seed + 1)
    node_type = rng.integers(0, num_types, num_nodes)
    E = base.num_edges
    etype = rng.integers(0, num_metapaths, E)
    row = np.asarray(base.row)[:E]
    col = np.asarray(base.col)[:E]
    metas = []
    shared_n = base.n_pad
    shared_e = base.e_pad
    for t in range(num_metapaths):
        sel = etype == t
        gm = from_coo(np.stack([row[sel], col[sel]]), num_nodes=num_nodes,
                      n_pad=shared_n, e_pad=shared_e, bucket=False)
        metas.append(add_self_loops(
            gm).replace(meta=gm.meta))  # self loops keep isolated nodes sane
    # repad metapath graphs back to the shared node size
    from ..data.graph import pad_to

    metas = [pad_to(m, shared_n, max(m.e_pad, shared_e)) for m in metas]
    nt = np.zeros(base.n_pad, np.int32)
    nt[:num_nodes] = node_type
    g = from_coo(
        np.stack([row, col]), num_nodes=num_nodes,
        edge_type=etype,
        n_pad=shared_n, e_pad=shared_e, bucket=False,
        x=np.asarray(base.x)[:num_nodes], y=np.asarray(base.y)[:num_nodes],
        train_mask=np.asarray(base.train_mask)[:num_nodes],
        val_mask=np.asarray(base.val_mask)[:num_nodes],
        test_mask=np.asarray(base.test_mask)[:num_nodes],
        meta={"num_classes": num_classes, "num_relations": num_metapaths,
              "name": f"hetero{num_nodes}"},
    )
    return g.replace(extras={
        "node_type": jnp.asarray(nt),
        "metapath_graphs": tuple(metas),
        "relation_graphs": tuple(metas),
    })


def bipartite_rec_graph(
    num_users: int = 200,
    num_items: int = 100,
    avg_interactions: int = 12,
    num_tastes: int = 5,
    seed: int = 0,
) -> Graph:
    """User-item bipartite graph with latent taste clusters (yelp2018
    stand-in for LightGCN): users interact mostly with items of their taste,
    so collaborative filtering is learnable."""
    rng = np.random.default_rng(seed)
    user_taste = rng.integers(0, num_tastes, num_users)
    item_taste = rng.integers(0, num_tastes, num_items)
    rows, cols = [], []
    for u in range(num_users):
        k = max(2, rng.poisson(avg_interactions))
        same = np.where(item_taste == user_taste[u])[0]
        other = np.where(item_taste != user_taste[u])[0]
        n_same = int(0.85 * k)
        pick = []
        if same.size:
            pick.append(rng.choice(same, size=min(n_same, same.size),
                                   replace=False))
        if other.size:
            pick.append(rng.choice(other, size=min(k - n_same, other.size),
                                   replace=False))
        items = np.unique(np.concatenate(pick)) + num_users
        rows.extend([u] * len(items))
        cols.extend(items.tolist())
    row = np.asarray(rows + cols)  # symmetric bipartite
    col = np.asarray(cols + rows)
    g = from_coo(np.stack([row, col]), num_nodes=num_users + num_items,
                 meta={"num_users": num_users, "num_items": num_items,
                       "num_classes": num_tastes,
                       "name": f"rec{num_users}x{num_items}"})
    return g


def random_triples(
    num_entities: int = 200,
    num_relations: int = 12,
    num_triples: int = 2000,
    structured: float = 0.8,
    seed: int = 0,
):
    """KG triple set with train/valid/test split (FB15k stand-in).

    A ``structured`` fraction follows a learnable rule (each relation is a
    fixed cyclic shift of entity ids, the additive structure TransE models);
    the rest is noise."""
    rng = np.random.default_rng(seed)
    h = rng.integers(0, num_entities, num_triples)
    r = rng.integers(0, num_relations, num_triples)
    shifts = rng.integers(1, num_entities, num_relations)
    t_rule = (h + shifts[r]) % num_entities
    t_noise = rng.integers(0, num_entities, num_triples)
    use_rule = rng.random(num_triples) < structured
    t = np.where(use_rule, t_rule, t_noise)
    triples = np.stack([h, r, t], 1).astype(np.int32)
    triples = np.unique(triples, axis=0)
    num_triples = triples.shape[0]
    rng.shuffle(triples)
    perm = rng.permutation(num_triples)
    n_tr = int(0.8 * num_triples)
    n_va = int(0.1 * num_triples)
    return {
        "train": triples[perm[:n_tr]],
        "valid": triples[perm[n_tr: n_tr + n_va]],
        "test": triples[perm[n_tr + n_va:]],
        "num_entities": num_entities,
        "num_relations": num_relations,
    }
