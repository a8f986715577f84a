"""Every model-registry entry trains end-to-end — the reference's test
strategy is one smoke test per model (tests/tasks/*, ~40 models in
test_node_classification.py alone); this file guarantees no registry entry
is a dead name. Budgets are tiny; assertions are sanity-range only."""

import numpy as np
import pytest

from cogdl_tpu.experiments import train
from cogdl_tpu.models import SUPPORTED_MODELS
from cogdl_tpu.wrappers import DEFAULT_WRAPPER

# wrapper family → (dataset, extra train kwargs)
FAMILY_SETUP = {
    "node_classification": ("sbm", dict(epochs=3, eval_step=3)),
    "gcnmix": ("sbm", dict(epochs=3, eval_step=3)),
    "sagn_staged": ("sbm", dict(epochs=3, eval_step=3)),
    "m3s_staged": ("sbm", dict(epochs=3, eval_step=3)),
    "correct_smooth": ("sbm", dict(epochs=3, eval_step=3)),
    "self_auxiliary": ("sbm", dict(epochs=3, eval_step=3)),
    "graph_classification": ("random-graphs", dict(epochs=2, batch_size=8)),
    "infograph": ("random-graphs", dict(epochs=2, batch_size=8)),
    "patchy_san": ("random-graphs", dict(epochs=2, batch_size=8)),
    "graph_embedding": ("random-graphs", dict()),
    "link_prediction": ("sbm", dict(epochs=3, eval_step=3)),
    "network_embedding": ("sbm", dict()),
    "triple_link_prediction": ("random-kg", dict(epochs=2)),
    "dgi": ("sbm", dict(epochs=3, eval_step=3)),
    "grace": ("sbm", dict(epochs=3, eval_step=3)),
    "graphmae": ("sbm", dict(epochs=3, eval_step=3)),
    "bgrl": ("sbm", dict(epochs=3, eval_step=3)),
    "graphmae2": ("sbm", dict(epochs=3, eval_step=3)),
    "unsup_graphsage": ("sbm", dict(epochs=2, eval_step=2)),
    "clustering": ("sbm", dict(epochs=3, eval_step=3)),
    "recommendation": ("rec-synthetic", dict(epochs=3, eval_step=3)),
    "heterogeneous_gnn": ("hetero-sbm", dict(epochs=3, eval_step=3)),
    "multiplex_embedding": ("hetero-sbm", dict()),
    "traffic_prediction": ("traffic-synthetic",
                           dict(epochs=2, eval_step=2, batch_size=8)),
    "neighbor_sampling": ("sbm", dict(epochs=2, eval_step=2)),
    "cluster": ("sbm", dict(epochs=2, eval_step=2)),
    "graphsaint": ("sbm", dict(epochs=2, eval_step=2, sampler="node",
                               sample_size=200, batches_per_epoch=2,
                               est_samples=8)),
    "gcc": ("sbm", dict(epochs=2, eval_step=2, batch_size=8,
                        subgraph_size=16, rw_hops=24, queue_size=64,
                        batches_per_epoch=2, probe_nodes=120)),
    "kg_link_prediction": ("random-kg", dict(epochs=3, eval_every=3)),
}

# models whose smoke run needs specific extra kwargs to stay tiny
MODEL_KW = {
    "stgcn": dict(hidden_size=16, spatial_channels=8),
    "stgat": dict(hidden_size=16),
    "sagn": dict(hidden_size=16),
    "m3s": dict(hidden_size=16),
}


@pytest.mark.parametrize("model", sorted(SUPPORTED_MODELS))
def test_every_registry_model_trains(model):
    wrapper = DEFAULT_WRAPPER.get(model, "node_classification")
    dataset, kw = FAMILY_SETUP[wrapper]
    kw = dict(kw)
    kw.setdefault("hidden_size", 16)
    kw.update(MODEL_KW.get(model, {}))
    res = train(dataset, model, seed=0, **kw)
    metric = [v for k, v in res.items()
              if k.startswith("test_") and isinstance(v, float)]
    assert metric, f"{model}: no test metric in {sorted(res)}"
    assert all(np.isfinite(v) for v in metric), f"{model}: non-finite {res}"
