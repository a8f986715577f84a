"""Axis-1 (lane) gather microbench: take(table[H, N], idx, axis=1) — the
head-major score-table lookup for fused GAT. Chained in-jit timing."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

N, H, E = 114_688, 8, 3_334_144
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
    key = jax.random.PRNGKey(0)
    t_hm = jax.random.normal(key, (H, N), jnp.float32)   # 3.7 MB
    t_em = jnp.asarray(t_hm.T)                           # [N, H] → 59 MB padded
    idx = jax.random.randint(key, (E,), 0, N, jnp.int32)

    @jax.jit
    def axis1_chain(t, idx):
        def body(acc, _):
            y = jax.lax.optimization_barrier(jnp.take(t, idx, axis=1))
            return acc + y[0, 0], None
        acc, _ = jax.lax.scan(body, jnp.zeros(()), None, length=K)
        return acc

    @jax.jit
    def axis0_chain(t, idx):
        def body(acc, _):
            y = jax.lax.optimization_barrier(jnp.take(t, idx, axis=0))
            return acc + y[0, 0], None
        acc, _ = jax.lax.scan(body, jnp.zeros(()), None, length=K)
        return acc

    for name, fn, t in (("axis1-headmajor", axis1_chain, t_hm),
                        ("axis0-edgemajor", axis0_chain, t_em)):
        dt = timed(fn, t, idx) / K
        print(f"{name:16s} {dt*1e3:7.2f} ms  ({dt/E*1e9:5.2f} ns/edge)")
        sys.stdout.flush()


if __name__ == "__main__":
    main()
