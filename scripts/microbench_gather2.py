"""Find the TPU gather fast-path knee: table size at which XLA stops staging
the gather operand in VMEM, and whether the slow path is row-count- or
byte-limited (informs bf16 tables and panel-partitioned layouts)."""

import sys
import time

import jax
import jax.numpy as jnp

S = 2_097_152


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
    return jnp.take(x, idx, axis=0).sum()


def main():
    key = jax.random.PRNGKey(0)
    for n, f, dt_ in [(100_096, 128, "f32"), (150_016, 128, "f32"),
                      (200_064, 128, "f32"), (250_112, 128, "f32"),
                      (400_128, 128, "f32"),
                      (500_096, 64, "f32"), (500_096, 128, "bf16"),
                      (1_000_192, 128, "f32")]:
        dt = jnp.bfloat16 if dt_ == "bf16" else jnp.float32
        x = jax.random.normal(key, (n, f), jnp.float32).astype(dt)
        idx = jax.random.randint(key, (S,), 0, n, jnp.int32)
        t = timed(g, x, idx)
        bpr = f * (2 if dt_ == "bf16" else 4)
        mb = n * bpr / 1e6
        print(f"N={n:8d} F={f:3d} {dt_}  table={mb:6.1f}MB  "
              f"{t*1e3:7.2f} ms  {S*bpr*2/t/1e9:6.1f} GB/s  "
              f"{t/S*1e9:5.1f} ns/row")
        sys.stdout.flush()


if __name__ == "__main__":
    main()
