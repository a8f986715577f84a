"""Microbenchmark: gather-table lane width vs the VMEM-staged fast path at
GAT's exact shapes (n=114688 table rows, 3.35M gathered rows).

Questions (motivated by the GAT profile: 136/144-lane table gathers run at
~13 ns/row while GCN's 128-lane tables run at ~2-3 ns/row):
  1. is the fast path lost exactly when lanes are not a multiple of 128?
  2. do two gathers of one 128-lane table beat one gather of a 136-lane
     table (same information, aligned rows)?
  3. does gathering the SAME table twice reuse its staging?

Timing honesty per CLAUDE.md: chain K reps inside one jit, read back one
scalar (block_until_ready lies on this relay backend).
"""

import time

import jax
import jax.numpy as jnp

N = 114_688
E = 3_334_144
K = 6  # chained reps inside the jit


def timed(fn, *args, reps=3):
    out = fn(*args)
    jax.tree_util.tree_map(lambda a: float(a.sum()) if hasattr(a, "sum")
                           else float(a), out)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        r = fn(*args)
        float(r)
        best = min(best, time.perf_counter() - t0)
    return best


def chain(body):
    """Run body K times with data-dependence between reps."""
    @jax.jit
    def fn(t, idx, idx2):
        acc = jnp.zeros((), jnp.float32)
        for k in range(K):
            acc = acc + body(t + acc, idx, idx2)
        return acc
    return fn


def main():
    key = jax.random.PRNGKey(0)
    kt, ki, kj = jax.random.split(key, 3)
    idx = jax.random.randint(ki, (E,), 0, N, jnp.int32)
    idx2 = jax.random.randint(kj, (E,), 0, N, jnp.int32)

    results = {}
    for W in (128, 136, 144, 256):
        t = jax.random.normal(kt, (N, W), jnp.float32)

        def one_gather(t, idx, idx2):
            return jnp.take(t, idx, axis=0, mode="clip").sum()

        dt = timed(chain(one_gather), t, idx, idx2)
        ns_row = dt / K / E * 1e9
        results[f"gather[{W}]"] = ns_row
        print(f"1 gather  W={W:3d}: {dt/K*1e3:7.2f} ms  {ns_row:5.2f} ns/row",
              flush=True)

    t128 = jax.random.normal(kt, (N, 128), jnp.float32)

    def two_gathers_same_table(t, idx, idx2):
        a = jnp.take(t, idx, axis=0, mode="clip").sum()
        b = jnp.take(t, idx2, axis=0, mode="clip").sum()
        return a + b

    dt = timed(chain(two_gathers_same_table), t128, idx, idx2)
    print(f"2 gathers same 128-table (diff idx): {dt/K*1e3:7.2f} ms  "
          f"{dt/K/(2*E)*1e9:5.2f} ns/row", flush=True)

    def two_gathers_two_tables(t, idx, idx2):
        a = jnp.take(t, idx, axis=0, mode="clip").sum()
        t2 = jax.lax.optimization_barrier(t * 1.0000001)
        b = jnp.take(t2, idx, axis=0, mode="clip").sum()
        return a + b

    dt = timed(chain(two_gathers_two_tables), t128, idx, idx2)
    print(f"2 gathers two 128-tables (barrier): {dt/K*1e3:7.2f} ms  "
          f"{dt/K/(2*E)*1e9:5.2f} ns/row", flush=True)

    # the actual fused-GAT fwd pattern: one 136 gather + one 128 gather
    t136 = jax.random.normal(kt, (N, 136), jnp.float32)

    def gat_like(t, idx, idx2):
        a = jnp.take(t[:, :136], idx, axis=0, mode="clip")
        s = a[:, :128].sum() + a[:, 128:].sum()
        t2 = jax.lax.optimization_barrier(t128 + s * 0)
        b = jnp.take(t2, idx, axis=0, mode="clip")[:, :8].sum()
        return s + b

    dt = timed(chain(gat_like), t136, idx, idx2)
    print(f"gat-like 136+128 pair: {dt/K*1e3:7.2f} ms  "
          f"{dt/K/(2*E)*1e9:5.2f} ns/row", flush=True)


if __name__ == "__main__":
    main()
