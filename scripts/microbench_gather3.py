"""Gather microbench v3: force materialisation (optimization_barrier) so we
time the gather itself, not a fused gather+reduce loop; compare random vs
real kernel-layout indices and small vs huge tables."""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

S = 4_194_304


def timed(fn, *args, reps=3):
    float(fn(*args))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        float(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best


@jax.jit
def g(x, idx):
    y = jnp.take(x, idx, axis=0)
    y = jax.lax.optimization_barrier(y)
    return y.sum()


def real_layout_indices(n, avg_degree=30):
    """col_k as the bench layout builds it: within-dst-tile sorted by col,
    zipf-popular destinations."""
    rng = np.random.default_rng(0)
    E = n * avg_degree
    ranks = np.arange(1, n + 1, dtype=np.float64)
    p = ranks ** -0.8
    p /= p.sum()
    col = rng.choice(n, size=E, p=p)
    row = rng.integers(0, n, size=E)
    order = np.lexsort((col, row // 128))
    col = col[order][:S] if E >= S else np.pad(col[order], (0, S - E))
    return jnp.asarray(col.astype(np.int32))


def main():
    key = jax.random.PRNGKey(0)
    for n in (100_096, 1_000_192, 2_450_048):
        x = jax.random.normal(key, (n, 128), jnp.float32)
        ridx = jax.random.randint(key, (S,), 0, n, jnp.int32)
        lidx = real_layout_indices(n)
        for name, idx in (("random", ridx), ("layout", lidx)):
            t = timed(g, x, idx)
            print(f"N={n:8d} {name:6s}  {t*1e3:7.2f} ms  "
                  f"{S*512*2/t/1e9:6.1f} GB/s  {t/S*1e9:5.1f} ns/row")
            sys.stdout.flush()


if __name__ == "__main__":
    main()
