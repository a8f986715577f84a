"""GraphMAE self-supervised pretraining + linear probe (BASELINE config 5)."""

import os
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

# honor JAX_PLATFORMS=cpu even where a sitecustomize pre-imports jax with a
# different platform (env alone is too late there; jax.config still works)
if os.environ.get("JAX_PLATFORMS") == "cpu":
    import jax

    jax.config.update("jax_platforms", "cpu")

from cogdl_tpu.experiments import train

res = train("sbm", "graphmae", seed=0, epochs=100, hidden_size=128,
            eval_step=10)
print({k: round(v, 4) for k, v in res.items() if "acc" in k})
