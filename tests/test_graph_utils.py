"""COO/CSR/CSC conversion helpers."""

import numpy as np

from cogdl_tpu.utils.graph_utils import (
    add_remaining_self_loops,
    coo2csc,
    coo2csr,
    csr2coo,
    symmetric_normalization,
)


def test_coo_csr_roundtrip(rng):
    N, E = 20, 60
    row = rng.integers(0, N, E)
    col = rng.integers(0, N, E)
    indptr, indices, perm = coo2csr(row, col, N)
    assert indptr[-1] == E
    r2, c2 = csr2coo(indptr, indices)
    assert sorted(zip(r2.tolist(), c2.tolist())) == sorted(
        zip(row.tolist(), col.tolist()))
    # perm maps slots to original edges
    np.testing.assert_array_equal(row[perm], r2)
    np.testing.assert_array_equal(col[perm], c2)


def test_csc_is_transpose(rng):
    N, E = 15, 40
    row = rng.integers(0, N, E)
    col = rng.integers(0, N, E)
    indptr_c, indices_c, _ = coo2csc(row, col, N)
    for v in range(N):
        got = sorted(indices_c[indptr_c[v]: indptr_c[v + 1]].tolist())
        want = sorted(row[col == v].tolist())
        assert got == want


def test_self_loops():
    ei = np.array([[0, 1, 2, 2], [1, 0, 2, 0]])
    out = add_remaining_self_loops(ei, 4)
    loops = out[:, out[0] == out[1]]
    assert loops.shape[1] == 4


def test_sym_norm_rows(rng):
    N, E = 10, 30
    row = rng.integers(0, N, E)
    col = rng.integers(0, N, E)
    w = np.ones(E)
    wn = symmetric_normalization(row, col, w, N)
    assert np.all(np.isfinite(wn)) and wn.shape == (E,)
