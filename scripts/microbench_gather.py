"""Microbenchmark: TPU row-gather throughput in different control-flow
structures — straight-line vs lax.scan vs python-unrolled-in-jit — to decide
how the mega-block streamed SpMM driver should iterate.

Timing honesty per CLAUDE.md: chain work inside one jit and read back a
scalar (block_until_ready lies on this relay backend).
"""

import sys
import time

import jax
import jax.numpy as jnp

N, F = 500_096, 128
S = 2_097_152          # rows gathered per block
B = 15                 # blocks


def timed(fn, *args, reps=3):
    out = fn(*args)
    float(out)  # compile + complete
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        float(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (N, F), jnp.float32)
    idx = jax.random.randint(key, (B, S), 0, N, jnp.int32)
    idx_sorted = jnp.sort(idx, axis=1)

    @jax.jit
    def straight(x, idx):
        acc = jnp.zeros((), jnp.float32)
        for b in range(B):
            acc += jnp.take(x, idx[b], axis=0).sum()
        return acc

    @jax.jit
    def scanned(x, idx):
        def body(acc, i):
            return acc + jnp.take(x, i, axis=0).sum(), None
        acc, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), idx)
        return acc

    @jax.jit
    def scanned_unroll(x, idx):
        def body(acc, i):
            return acc + jnp.take(x, i, axis=0).sum(), None
        acc, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), idx,
                              unroll=5)
        return acc

    gb = B * S * F * 4 * 2 / 1e9  # read + write per full pass
    for name, fn, ix in [("straight", straight, idx),
                         ("scan", scanned, idx),
                         ("scan_unroll5", scanned_unroll, idx),
                         ("scan_sorted", scanned, idx_sorted)]:
        dt = timed(fn, x, ix)
        print(f"{name:14s} {dt*1e3:8.1f} ms  {gb/dt:7.1f} GB/s")
        sys.stdout.flush()


if __name__ == "__main__":
    main()
