"""Microbenchmark: can an IN-KERNEL gather beat XLA's staged `jnp.take`?

VERDICT r01 asks for a Pallas pass that pulls source rows into VMEM inside
the segment kernel instead of a separate XLA gather. The viable in-kernel
mechanisms on this backend are measured here against the XLA baseline:

  A. XLA `jnp.take` (staged fast path)           — the ~2.9 ns/row incumbent
  B. Mosaic `tpu.dynamic_gather` (via take_along_axis), window == block
     (the ONLY form Mosaic lowers: operand shape == output shape) — rate of
     the hardware sublane-gather engine, window-local indices only
  C. one-hot MXU gather: msg = onehot(idx) @ window (windows 256/512/1024)
     — per-slot cost grows linearly with the window, so it only wins if a
     layout can confine each chunk's sources to a tiny window
  D. per-row DMA (HBM→VMEM make_async_copy per row, 8 outstanding)

Interpretation: B/C rates are WINDOW-LOCAL. For a random power-law graph a
destination tile's sources span the whole table (no locality), so a full
in-kernel replacement needs per-chunk cost ≈ (N / window) × window-gather —
linear in N, hopeless unless B beats A by that factor. The numbers this
prints are the evidence for the roofline restatement in BENCH/README.

Timing honesty per CLAUDE.md: K reps chained inside one jit, one scalar
readback (block_until_ready lies on this relay backend).
"""

import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N = 100_352          # table rows (bench scale)
E = 3_145_728        # gathered rows (~3.1M, multiple of 1024)
T = 1024             # slots per chunk
K = 6                # chained reps inside one jit


def timed(fn, *args, reps=3):
    print("timed: compiling...", flush=True)
    r = fn(*args)
    print("timed: dispatched, reading back...", flush=True)
    float(r)
    print("timed: warm", flush=True)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        r = fn(*args)
        float(r)
        best = min(best, time.perf_counter() - t0)
    return best


def chain(body):
    @jax.jit
    def fn(t, idx):
        acc = jnp.zeros((), jnp.float32)
        for _ in range(K):
            acc = acc + body(t + acc, idx)
        return acc
    return fn


def report(name, dt, rows):
    print(f"{name:44s}: {dt / K * 1e3:8.2f} ms   "
          f"{dt / K / rows * 1e9:6.2f} ns/row", flush=True)


def xla_take(t, idx):
    return jnp.take(t, idx, axis=0, mode="clip").sum()


def make_dyn_gather(n_chunks):
    """B: one tpu.dynamic_gather per chunk; indices local to the chunk's own
    [T, 128] operand block (window == block, the only lowerable form)."""
    def kernel(tab_ref, idx_ref, out_ref):
        idx2 = jnp.broadcast_to(idx_ref[:][:, None], (T, 128))
        out_ref[0, 0] = jnp.sum(
            jnp.take_along_axis(tab_ref[:], idx2, axis=0))

    def run(t, idx):
        parts = pl.pallas_call(
            kernel,
            grid=(n_chunks,),
            in_specs=[
                pl.BlockSpec((T, 128), lambda c: (c, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((T,), lambda c: (c,),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, 1), lambda c: (c, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((n_chunks, 1), jnp.float32),
        )(t, idx)
        return parts.sum()

    return run


def make_onehot(window, n_chunks):
    """C: msg = onehot(idx) @ window_block on the MXU."""
    def kernel(win_ref, idx_ref, out_ref):
        ids = jax.lax.broadcasted_iota(jnp.int32, (T, window), 1)
        g = jnp.where(idx_ref[:][:, None] == ids, 1.0, 0.0)
        msg = jax.lax.dot_general(
            g, win_ref[:], dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        out_ref[0, 0] = jnp.sum(msg)

    def run(t, idx):
        parts = pl.pallas_call(
            kernel,
            grid=(n_chunks,),
            in_specs=[
                pl.BlockSpec((window, 128), lambda c: (c % (N // window), 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((T,), lambda c: (c,),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, 1), lambda c: (c, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((n_chunks, 1), jnp.float32),
        )(t, idx)
        return parts.sum()

    return run


def make_row_dma(n_chunks, outstanding=8):
    """D: per-row HBM→VMEM DMA, `outstanding` in flight."""
    def kernel(idx_ref, tab_ref, out_ref):
        def body(scratch, sems):
            def get(slot, i):
                return pltpu.make_async_copy(
                    tab_ref.at[pl.ds(idx_ref[i], 1), :],
                    scratch.at[pl.ds(slot, 1), :],
                    sems.at[slot])

            for s in range(outstanding):
                get(s, s).start()

            def loop(i, acc):
                slot = jax.lax.rem(i, outstanding)
                pltpu.make_async_copy(
                    tab_ref.at[pl.ds(idx_ref[i], 1), :],
                    scratch.at[pl.ds(slot, 1), :],
                    sems.at[slot]).wait()
                acc = acc + jnp.sum(scratch[pl.ds(slot, 1), :])

                @pl.when(i + outstanding < T)
                def _():
                    get(slot, i + outstanding).start()

                return acc

            out_ref[0, 0] = jax.lax.fori_loop(0, T, loop, 0.0)

        pl.run_scoped(
            body,
            scratch=pltpu.VMEM((outstanding, 128), jnp.float32),
            sems=pltpu.SemaphoreType.DMA((outstanding,)),
        )

    def run(t, idx):
        parts = pl.pallas_call(
            kernel,
            grid=(n_chunks,),
            in_specs=[
                pl.BlockSpec((T,), lambda c: (c,),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.ANY),
            ],
            out_specs=pl.BlockSpec((1, 1), lambda c: (c, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((n_chunks, 1), jnp.float32),
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
        )(idx, t)
        return parts.sum()

    return run


def main():
    import sys
    stage = sys.argv[1] if len(sys.argv) > 1 else "A"
    # this relay deadlocks when the first device op arrives ~immediately
    # after backend attach (see memory: tpu-wedge-recovery); give the
    # session time to finish setup like bench.py's host-side graph build
    # incidentally does
    time.sleep(30)
    print("post-attach settle done", flush=True)
    key = jax.random.PRNGKey(0)
    kt, ki = jax.random.split(key)
    t = jax.random.normal(kt, (N, 128), jnp.float32)
    n_chunks = E // T
    print(f"stage {stage}: data ready", flush=True)
    print(f"stage {stage}: device sanity t.sum()={float(t.sum()):.3f}",
          flush=True)

    if stage == "A":
        idx_full = jax.random.randint(ki, (E,), 0, N, jnp.int32)
        report("A. XLA take (full range)",
               timed(chain(xla_take), t, idx_full), E)
    elif stage == "B":
        idx_local = jax.random.randint(ki, (E,), 0, T, jnp.int32)
        report("B. in-kernel dynamic_gather (window=1024)",
               timed(chain(make_dyn_gather(n_chunks)), t, idx_local), E)
    elif stage.startswith("C"):
        w = int(stage[1:])
        idx_w = jax.random.randint(ki, (E,), 0, w, jnp.int32)
        report(f"C. in-kernel one-hot MXU (window={w})",
               timed(chain(make_onehot(w, n_chunks)), t, idx_w), E)
    elif stage == "D":
        e_small = E // 16
        idx_small = jax.random.randint(ki, (e_small,), 0, N, jnp.int32)
        report("D. per-row DMA (HBM, 8 outstanding) [E/16]",
               timed(chain(make_row_dma(e_small // T)), t, idx_small),
               e_small)


if __name__ == "__main__":
    main()
