"""Decompose the bench-config SpMM with tunnel-honest timing: chain K hops
inside one jit (lax.scan) and read back one scalar, so the ~27 ms relay
round-trip amortises away. Times gather-only chains, kernel-only chains, and
full spmm chains at 100k nodes x30."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from cogdl_tpu.data.graph import add_self_loops, sym_norm
from cogdl_tpu.datasets.synthetic import powerlaw_graph
from cogdl_tpu.ops.pallas import prepare_spmm
from cogdl_tpu.ops.pallas.segment_kernels import (
    sorted_segment_matmul,
    spmm_pallas,
)

K = 10


def timed(fn, *args, reps=3):
    float(fn(*args))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        float(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    g = powerlaw_graph(100_000, avg_degree=30, feat_dim=128,
                       device_features=True)
    g = prepare_spmm(sym_norm(add_self_loops(g)))
    ex = g.extras
    x = g.x
    E_k = ex["spmm_fw_col"].shape[0]
    n_pad = g.n_pad
    col, w = ex["spmm_fw_col"], ex["spmm_fw_w"]
    row, ct = ex["spmm_fw_row"], ex["spmm_fw_ct"]
    print("E_k =", E_k, "n_pad =", n_pad)

    @jax.jit
    def gather_chain(x):
        def body(c, _):
            y = jnp.take(c, col, axis=0)
            return y[:n_pad] * 0.5, None
        c, _ = jax.lax.scan(body, x, None, length=K)
        return c.sum()

    @jax.jit
    def kernel_chain(x):
        msg0 = jnp.take(x, col, axis=0)

        def body(msg, _):
            out = sorted_segment_matmul(msg, row, w, ct, n_pad)
            # tie the next iteration to out with an in-place 1-row update
            # (prevents loop-invariant hoisting without touching 1.7 GB)
            msg = jax.lax.dynamic_update_slice(msg, out[:1] * 1e-6, (0, 0))
            return msg, out[0, 0]
        _, sums = jax.lax.scan(body, msg0, None, length=K)
        return sums.sum()

    @jax.jit
    def spmm_chain(x):
        def body(c, _):
            y = spmm_pallas(c, col, w, row, ct, col, w, row, ct)
            return y, None
        c, _ = jax.lax.scan(body, x, None, length=K)
        return c.sum()

    for name, fn in (("gather", gather_chain), ("kernel", kernel_chain),
                     ("spmm", spmm_chain)):
        t = timed(fn, x) / K
        print(f"{name:7s}: {t*1e3:7.2f} ms/hop  ({t/E_k*1e9:4.1f} ns/slot)")
        sys.stdout.flush()


if __name__ == "__main__":
    main()
