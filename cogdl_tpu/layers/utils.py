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


def get_activation(name):
    """Activation lookup (reference: cogdl/utils/utils.py get_activation —
    including its ``None`` → identity behaviour). When the trainer-level
    activation-compression switch is on, ``relu`` resolves to the
    bool-mask-residual variant (ops.actnn.compressed_relu)."""
    if name == "relu":
        from ..ops import actnn

        if actnn.compression_enabled():
            return actnn.compressed_relu
    if name is None:
        return _ACTIVATIONS["identity"]
    try:
        return _ACTIVATIONS[name]
    except KeyError:
        raise ValueError(f"unknown activation {name!r}; known: {sorted(_ACTIVATIONS)}")


import flax.linen as nn


class CDense(nn.Module):
    """Param-compatible twin of ``nn.Dense`` (same "kernel"/"bias" params,
    same default inits) that routes through :func:`ops.actnn.compressed_dense`
    — under ``Trainer(activation_compression=True)`` the backward keeps an
    int8 per-row-scaled copy of the input instead of the f32 activation
    (the ActNN residual, reference operators/linear.py:15-71)."""

    features: int
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        import jax.numpy as jnp

        from ..ops import actnn

        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (x.shape[-1], self.features))
        bias = (self.param("bias", nn.initializers.zeros, (self.features,))
                if self.use_bias else None)
        return actnn.compressed_dense(
            x, kernel.astype(x.dtype),
            None if bias is None else bias.astype(x.dtype))


class MaskedBatchNorm(nn.Module):
    """BatchNorm whose batch statistics ignore pad rows.

    Graphs here are statically padded; all-zero pad rows pull the batch mean
    toward 0 and shrink the variance in proportion to the padding fraction,
    which the reference (unpadded tensors) never sees. Pass the graph's
    node mask; running stats live in the ``batch_stats`` collection with
    nn.BatchNorm's semantics (mutable during training applies).
    """

    momentum: float = 0.99
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x, mask=None, use_running_average: bool = True):
        f = x.shape[-1]
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros(f, jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones(f, jnp.float32))
        scale = self.param("scale", nn.initializers.ones, (f,))
        bias = self.param("bias", nn.initializers.zeros, (f,))
        if use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            xf = x.astype(jnp.float32)
            if mask is None:
                mean = xf.mean(axis=0)
                var = xf.var(axis=0)
            else:
                m = mask.astype(jnp.float32)[:, None]
                n = jnp.maximum(m.sum(), 1.0)
                mean = (xf * m).sum(axis=0) / n
                var = (jnp.square(xf - mean) * m).sum(axis=0) / n
            if not self.is_initializing():
                mom = self.momentum
                ra_mean.value = mom * ra_mean.value + (1 - mom) * mean
                ra_var.value = mom * ra_var.value + (1 - mom) * var
        inv = jax.lax.rsqrt(var + self.epsilon).astype(x.dtype)
        return (x - mean.astype(x.dtype)) * inv * scale + bias
