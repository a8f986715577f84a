"""Does a gather whose operand is a dynamic-slice (source panel) of a huge
table hit the VMEM-staged fast path inside a scan? Decides the panel-
partitioned products layout. Chained timing (one readback per K hops)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

N = 2_450_048          # products-scale table (1.25 GB f32)
PN = 188_416           # panel rows (~96 MB f32): 1472 * 128
S = 2_097_152          # rows gathered per block
K = 13


def timed(fn, *args, reps=3):
    float(fn(*args))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        float(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (N, 128), jnp.float32)
    # per-block panel ids and PANEL-LOCAL indices
    pids = jnp.arange(K, dtype=jnp.int32) % (N // PN)
    idx = jax.random.randint(key, (K, S), 0, PN, jnp.int32)

    @jax.jit
    def full_table(x, idx):
        def body(acc, i):
            y = jnp.take(x, i, axis=0)
            return acc + y[0, 0], None
        acc, _ = jax.lax.scan(body, jnp.zeros(()), idx)
        return acc

    @jax.jit
    def panel_slice(x, idx, pids):
        def body(acc, blk):
            i, p = blk
            panel = jax.lax.dynamic_slice(x, (p * PN, 0), (PN, 128))
            y = jnp.take(panel, i, axis=0)
            return acc + y[0, 0], None
        acc, _ = jax.lax.scan(body, jnp.zeros(()), (idx, pids))
        return acc

    t = timed(full_table, x, idx) / K
    print(f"full-table  : {t*1e3:7.2f} ms/blk ({t/S*1e9:4.1f} ns/row)")
    t = timed(panel_slice, x, idx, pids) / K
    print(f"panel-slice : {t*1e3:7.2f} ms/blk ({t/S*1e9:4.1f} ns/row)")


if __name__ == "__main__":
    main()
