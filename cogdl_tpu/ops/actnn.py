"""Activation compression — the TPU-native equivalent of ActNN
(reference third_party/actnn via cogdl/operators/linear.py:15-71 QLinear and
operators/spmm.py:89-133 QSPMM: store quantised activations for the
backward, dequantise on use).

Design (per-op custom VJPs, not CUDA kernels):
  * ``act_dense(x, w, b)`` — the backward needs ``x`` only for
    ``dw = xᵀ·g``; the residual is stored as **int8 with per-row scales**
    (4× smaller than f32) and dequantised in the VJP. ``dx = g·wᵀ`` uses
    the exact ``w``.
  * ``act_relu(x)`` — the backward needs only the sign mask: stored as
    bool (1 byte/elem; XLA packs predicates).
  * SpMM needs NO activation residual at all (linear in x; backward is the
    transpose SpMM) — cogdl_tpu's spmm already stores only layout arrays.

So an activation-compressed GCN layer keeps one int8 copy of each layer
input plus a bool mask — the ActNN memory profile with MXU-native math
(the quantisation noise enters only dw, matching ActNN's analysis)."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def quantize_rowwise(x: jnp.ndarray):
    """→ (int8 values, per-row f32 scales); x ≈ q · scale."""
    amax = jnp.max(jnp.abs(x), axis=-1, keepdims=True)
    scale = jnp.maximum(amax, 1e-12) / 127.0
    q = jnp.clip(jnp.round(x / scale), -127, 127).astype(jnp.int8)
    return q, scale


def dequantize_rowwise(q: jnp.ndarray, scale: jnp.ndarray) -> jnp.ndarray:
    return q.astype(jnp.float32) * scale


@jax.custom_vjp
def act_dense(x, w, b):
    """y = x @ w + b with an int8-compressed residual for x."""
    return x @ w + b


def _act_dense_fwd(x, w, b):
    q, scale = quantize_rowwise(x)
    return x @ w + b, (q, scale, w)


def _act_dense_bwd(res, g):
    q, scale, w = res
    x_hat = dequantize_rowwise(q, scale)
    dx = g @ w.T
    dw = x_hat.T @ g
    db = jnp.sum(g, axis=0)
    return dx, dw, db


act_dense.defvjp(_act_dense_fwd, _act_dense_bwd)


@jax.custom_vjp
def act_relu(x):
    """relu storing only the sign mask (bool) for the backward."""
    return jnp.maximum(x, 0)


def _act_relu_fwd(x):
    return jnp.maximum(x, 0), x > 0


def _act_relu_bwd(mask, g):
    return (jnp.where(mask, g, 0.0),)


act_relu.defvjp(_act_relu_fwd, _act_relu_bwd)


# ---------------------------------------------------------------------------
# Trainer-level switch (round 5): Trainer(activation_compression=True) turns
# the standard GCN-family layer stack's dense/relu into the compressed ops
# without touching model params (layers route through compressed_* helpers).
# The switch is read at TRACE time — the Trainer sets it around its jit
# tracing; it is process-global (document: not thread-safe across trainers).
# ---------------------------------------------------------------------------

_COMPRESS = False


def set_compression(on: bool) -> bool:
    """Set the global activation-compression switch; returns prior value."""
    global _COMPRESS
    prev = _COMPRESS
    _COMPRESS = bool(on)
    return prev


def compression_enabled() -> bool:
    return _COMPRESS


def compressed_dense(x, kernel, bias=None):
    """x @ kernel (+ bias), storing an int8 residual when the switch is on."""
    if _COMPRESS:
        b = jnp.zeros((kernel.shape[-1],), x.dtype) if bias is None else bias
        return act_dense(x, kernel, b)
    y = x @ kernel
    return y if bias is None else y + bias


def compressed_relu(x):
    """relu whose backward residual is a bool mask when the switch is on."""
    return act_relu(x) if _COMPRESS else jnp.maximum(x, 0)
