"""Graph/feature transforms — rebuild of reference cogdl/utils/transform.py
(dropout/augmentation helpers) as pure jax functions with static shapes
(drops are weight/feature masks, never shape changes)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..data.graph import Graph


def drop_edge(graph: Graph, rate: float, rng) -> Graph:
    """DropEdge as a weight mask; clears the cached norm tag."""
    keep = jax.random.bernoulli(rng, 1.0 - rate, graph.edge_weight.shape)
    w = graph.edge_weight * keep / jnp.maximum(1.0 - rate, 1e-6)
    return graph.replace(
        edge_weight=w,
        meta=tuple((k, v) for k, v in graph.meta if k != "norm"))


def drop_node(x: jnp.ndarray, rate: float, rng) -> jnp.ndarray:
    """DropNode (GRAND-style): zero whole feature rows, rescale."""
    keep = jax.random.bernoulli(rng, 1.0 - rate, (x.shape[0], 1))
    return x * keep / jnp.maximum(1.0 - rate, 1e-6)


def drop_feature(x: jnp.ndarray, rate: float, rng) -> jnp.ndarray:
    """Column-wise feature masking (GRACE augmentation)."""
    keep = jax.random.bernoulli(rng, 1.0 - rate, (1, x.shape[1]))
    return x * keep


def add_gaussian_noise(x: jnp.ndarray, sigma: float, rng) -> jnp.ndarray:
    return x + sigma * jax.random.normal(rng, x.shape)


def normalize_features(x: jnp.ndarray) -> jnp.ndarray:
    """Row L1 normalisation (planetoid preprocessing)."""
    s = jnp.sum(jnp.abs(x), axis=1, keepdims=True)
    return x / jnp.maximum(s, 1e-12)
