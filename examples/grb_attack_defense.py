"""GRB robustness round-trip: train a GCN, attack it with PRBCD edge
modification, then show RobustGCN retaining accuracy under the transferred
attack (reference examples/GRB attack/defense protocol).

    JAX_PLATFORMS=cpu python examples/grb_attack_defense.py
"""

import os
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

# honor JAX_PLATFORMS=cpu even where a sitecustomize pre-imports jax with a
# different platform (env alone is too late there; jax.config still works)
if os.environ.get("JAX_PLATFORMS") == "cpu":
    import jax

    jax.config.update("jax_platforms", "cpu")

import jax

from cogdl_tpu.datasets import build_dataset
from cogdl_tpu.models import build_model
from cogdl_tpu.trainer.trainer import Trainer, TrainerConfig
from cogdl_tpu.utils.evaluator import masked_accuracy
from cogdl_tpu.utils.grb import prbcd_modification_attack
from cogdl_tpu.wrappers.node_classification import NodeClfWrapper


def fit(name, ds, **kw):
    model = build_model(name, in_features=ds.num_features,
                        out_features=ds.num_classes, dropout=0.0, **kw)
    w = NodeClfWrapper(model, ds)
    res = Trainer(TrainerConfig(epochs=40)).run(w, ds.graph)
    v = res.pop("_variables")
    g = w.prepare_graph(ds.graph)
    return model, v, g


def acc(model, v, g):
    logits = model.apply(v, g, g.x, training=False)
    return float(masked_accuracy(logits, g.y, g.test_mask & g.node_mask()))


ds = build_dataset("sbm")
gcn, gv, gg = fit("gcn", ds)
rob, rv, rg = fit("robustgcn", ds, hidden_size=32)

g_adv = prbcd_modification_attack(
    lambda v, g: gcn.apply(v, g, g.x, training=False), gv, gg,
    n_edge_mod=150, block_size=2048, n_epoch=25)

print(f"GCN       clean {acc(gcn, gv, gg):.3f}  under PRBCD "
      f"{acc(gcn, gv, g_adv):.3f}")
print(f"RobustGCN clean {acc(rob, rv, rg):.3f}  under PRBCD "
      f"{acc(rob, rv, g_adv):.3f}")
