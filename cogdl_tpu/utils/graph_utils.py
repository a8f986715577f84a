"""Graph format conversions — rebuild of reference cogdl/utils/graph_utils.py
(COO↔CSR↔CSC) on numpy + the native coo2csr fast path."""

from __future__ import annotations

from typing import Tuple

import numpy as np


def coo2csr(row, col, num_nodes: int) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(indptr, indices, perm) — perm maps CSR slots back to input edges.
    Uses the native C++ path when built."""
    from .. import native

    row = np.asarray(row, np.int64)
    col = np.asarray(col, np.int64)
    if native.available():
        return native.coo2csr(row, col, num_nodes)
    order = np.argsort(row, kind="stable")
    indptr = np.zeros(num_nodes + 1, np.int64)
    np.cumsum(np.bincount(row, minlength=num_nodes), out=indptr[1:])
    return indptr, col[order], order


def csr2coo(indptr, indices) -> Tuple[np.ndarray, np.ndarray]:
    indptr = np.asarray(indptr)
    rows = np.repeat(np.arange(indptr.shape[0] - 1), np.diff(indptr))
    return rows, np.asarray(indices)


def coo2csc(row, col, num_nodes: int) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """CSC = CSR of the transpose."""
    return coo2csr(col, row, num_nodes)


def csr2csc(indptr, indices, num_nodes: int):
    rows, cols = csr2coo(indptr, indices)
    return coo2csc(rows, cols, num_nodes)


def add_remaining_self_loops(edge_index, num_nodes: int):
    """COO-level helper (reference data.py:175): dedupe loops, add one per
    node; returns new edge_index."""
    ei = np.asarray(edge_index)
    keep = ei[0] != ei[1]
    loops = np.arange(num_nodes)
    return np.concatenate(
        [ei[:, keep], np.stack([loops, loops])], axis=1)


def symmetric_normalization(row, col, weight, num_nodes: int) -> np.ndarray:
    """Host-side D^-1/2 A D^-1/2 edge reweighting."""
    deg = np.bincount(row, weights=weight, minlength=num_nodes)
    dinv = np.where(deg > 0, 1.0 / np.sqrt(np.maximum(deg, 1e-12)), 0.0)
    return weight * dinv[row] * dinv[col]
