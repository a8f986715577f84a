"""Knowledge-graph completion with the TransE family."""

import os
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

# honor JAX_PLATFORMS=cpu even where a sitecustomize pre-imports jax with a
# different platform (env alone is too late there; jax.config still works)
if os.environ.get("JAX_PLATFORMS") == "cpu":
    import jax

    jax.config.update("jax_platforms", "cpu")

from cogdl_tpu import experiment

experiment(dataset="random-kg", model=["transe", "rotate", "distmult"],
           seed=0, epochs=60, hidden_size=64)
