"""Neighbor-sampled GraphSAGE training with the ON-DEVICE sampler.

The CSR and feature table stay resident in HBM; fanout sampling runs inside
the jitted train step, and the Trainer's epoch-scan protocol trains a whole
epoch per dispatch (one host round-trip per epoch). Compare with the
reference's host-side C++ sampler + DataLoader workers
(cogdl/data/sampler.py) — here a batch "ships" a [B] int32 seed row.

    python examples/sampled_training.py            # axon TPU if attached
    JAX_PLATFORMS=cpu python examples/sampled_training.py
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

experiment(
    dataset="sbm-large",          # 4k-node SBM: labels actually learnable
    model="sage",                 # (powerlaw-* labels are random — bench-only)
    wrapper="neighbor_sampling_device",
    fanouts=(10, 10),
    batch_size=256,
    epochs=30,
    eval_step=5,
    hidden_size=64,
    seed=[0],
)
