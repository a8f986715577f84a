"""KG triple link prediction wrapper — rebuild of reference
triple_link_prediction_mw (TransE-family training + filtered MRR eval,
cogdl/wrappers/model_wrapper/link_prediction/triple_link_prediction_mw.py)."""

from __future__ import annotations

from typing import Dict

from ..models import build_model


class TripleLinkPredictionWrapper:
    def __init__(self, model_name: str, dataset, seed: int = 0, **model_kwargs):
        triples = dataset.triples
        model_kwargs.setdefault("num_entities", triples["num_entities"])
        model_kwargs.setdefault("num_relations", triples["num_relations"])
        self.model = build_model(model_name, seed=seed, **model_kwargs)
        self.dataset = dataset

    def run_embedding(self) -> Dict[str, float]:
        triples = self.dataset.triples
        self.model.train_triples(triples)
        val = self.model.evaluate(triples, "valid")
        test = self.model.evaluate(triples, "test")
        out = {f"val_{k}": v for k, v in val.items()}
        out.update({f"test_{k}": v for k, v in test.items()})
        out["val_acc"] = out["val_mrr"]
        out["test_acc"] = out["test_mrr"]
        return out
