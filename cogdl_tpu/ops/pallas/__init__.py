"""Pallas performance tier for TPU.

Kernels register themselves behind the dispatch hooks used by
``cogdl_tpu.ops.spmm``; when a graph carries a cached block-sparse (BCSR)
layout and we are running on TPU, SpMM runs on the MXU as block-sparse matmul
(the TPU-idiomatic replacement for GE-SpMM, reference
cogdl/operators/spmm/spmm_kernel.cu).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def maybe_bcsr_spmm(graph, x) -> Optional[jnp.ndarray]:
    """Return the Pallas BCSR SpMM result if this graph has a prepared BCSR
    layout and the backend supports it; otherwise None (caller falls back)."""
    extras = graph.extras
    if not extras or "bcsr_blocks" not in extras:
        return None
    try:
        from .bcsr_spmm import bcsr_spmm_apply
    except Exception:  # pragma: no cover - pallas unavailable
        return None
    return bcsr_spmm_apply(graph, x)
