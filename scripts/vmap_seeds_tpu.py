"""TPU artifact: seed-parallel (vmapped) training vs sequential seeds.

VERDICT r4 "next" #4 done-criterion: >=3x wall-clock for 5 seeds on a
small graph on TPU. Both paths run the same epochs (patience disabled) so
the comparison is pure throughput; compile time is reported separately
(the vmapped path compiles ONE program, the sequential path one per seed).

Run DETACHED:
    setsid nohup python -u scripts/vmap_seeds_tpu.py > logs_r5/vmap_seeds.log 2>&1 &
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax

    print("devices:", jax.devices(), flush=True)
    on_tpu = jax.devices()[0].platform != "cpu"
    if on_tpu:
        time.sleep(30)
        import jax.numpy as jnp

        float((jnp.ones((128, 128)) @ jnp.ones((128, 128))).sum())
        print("probe ok", flush=True)

    from cogdl_tpu.experiments import train, train_seeds_vmapped

    seeds = list(range(int(os.environ.get("VS_SEEDS", 16))))
    kw = dict(epochs=int(os.environ.get("VS_EPOCHS", 400)), patience=10_000,
              eval_step=10)
    ds, mdl = "sbm", "gcn"

    t0 = time.time()
    res_v = train_seeds_vmapped(ds, mdl, seeds, **kw)
    t_v = time.time() - t0
    print(f"vmapped: {t_v:.2f}s  accs="
          f"{[round(r['test_acc'], 3) for r in res_v]}", flush=True)

    t0 = time.time()
    res_s = [train(ds, mdl, seed=s, **kw) for s in seeds]
    t_s = time.time() - t0
    print(f"sequential: {t_s:.2f}s  accs="
          f"{[round(r['test_acc'], 3) for r in res_s]}", flush=True)

    out = {
        "dataset": ds, "model": mdl, "seeds": seeds, **kw,
        "device": str(jax.devices()[0]),
        "wall_s_vmapped": round(t_v, 2),
        "wall_s_sequential": round(t_s, 2),
        "speedup": round(t_s / t_v, 2),
        "test_acc_vmapped": [round(r["test_acc"], 4) for r in res_v],
        "test_acc_sequential": [round(r["test_acc"], 4) for r in res_s],
    }
    print(json.dumps(out), flush=True)
    if on_tpu:
        with open(os.path.join(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__))), "VMAP_SEEDS_r05.json"),
                "w") as f:
            json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
