"""Full-batch node classification across several GNNs.

    python examples/node_classification.py            # synthetic (offline)
    python examples/node_classification.py cora       # with planetoid files
"""

import os
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

# honor JAX_PLATFORMS=cpu even where a sitecustomize pre-imports jax with a
# different platform (env alone is too late there; jax.config still works)
if os.environ.get("JAX_PLATFORMS") == "cpu":
    import jax

    jax.config.update("jax_platforms", "cpu")

from cogdl_tpu import experiment

dataset = sys.argv[1] if len(sys.argv) > 1 else "sbm"
experiment(dataset=dataset, model=["gcn", "gat", "appnp"], seed=[0, 1],
           epochs=200, use_best_config=(dataset != "sbm"))
