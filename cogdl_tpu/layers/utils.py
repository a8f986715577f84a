"""Shared layer helpers (activation registry, init helpers)."""

from __future__ import annotations

import jax
import jax.numpy as jnp


_ACTIVATIONS = {
    "relu": jax.nn.relu,
    "gelu": jax.nn.gelu,
    "elu": jax.nn.elu,
    "sigmoid": jax.nn.sigmoid,
    "tanh": jnp.tanh,
    "leaky_relu": lambda x: jax.nn.leaky_relu(x, 0.2),
    "prelu": lambda x: jax.nn.leaky_relu(x, 0.25),
    "softplus": jax.nn.softplus,
    "identity": lambda x: x,
    "none": lambda x: x,
}


def get_activation(name: str):
    """Activation lookup (reference: cogdl/utils/utils.py get_activation)."""
    try:
        return _ACTIVATIONS[name]
    except KeyError:
        raise ValueError(f"unknown activation {name!r}; known: {sorted(_ACTIVATIONS)}")
