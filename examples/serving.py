"""Train → export → serve, end to end.

Train a GCN through the one-call experiment API, AOT-export the trained
forward to a StableHLO artifact (+ trained-weights sidecar), then serve
predictions from a Predictor that needs no model code.

    python examples/serving.py            # runs on the default backend
"""

import sys
import tempfile

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np

from cogdl_tpu import experiment
from cogdl_tpu.data.graph import add_self_loops, sym_norm
from cogdl_tpu.datasets import build_dataset
from cogdl_tpu.serve import Predictor

with tempfile.TemporaryDirectory() as d:
    path = d + "/gcn.stablehlo"
    experiment(dataset="sbm", model="gcn", epochs=100, seed=[0],
               export_path=path)

    # --- a "serving process": artifact + graph frame, no flax model ---
    # prepare the frame EXACTLY as training did (wrapper prepare_graph:
    # self-loops + the model's adjacency norm, + kernel layouts on TPU)
    from cogdl_tpu.ops.pallas import _is_tpu, prepare_spmm

    g = sym_norm(add_self_loops(build_dataset("sbm").graph))
    if _is_tpu():
        g = prepare_spmm(g)
    pred = Predictor(path, g)          # auto-loads the .params sidecar
    cls = pred.predict(nodes=[0, 5, 9])
    probs = pred.predict_proba(nodes=[0, 5, 9])
    acc = float((np.asarray(pred.predict())
                 == np.asarray(g.y)[: g.num_nodes]).mean())
    print("classes for nodes [0, 5, 9]:", np.asarray(cls))
    print("max probs:", np.asarray(probs.max(-1)).round(3))
    print(f"served full-graph accuracy: {acc:.4f}")
