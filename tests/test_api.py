"""API shell: CLI options, AutoML, pipelines, recommendation."""

import numpy as np
import pytest

from cogdl_tpu.options import parse_args_and_kwargs
from cogdl_tpu.pipelines import pipeline


def test_parse_args_routing():
    args, kwargs = parse_args_and_kwargs(
        ["--dataset", "sbm", "--model", "gcn", "--epochs", "5",
         "--hidden-size", "32", "nhead=4", "alpha=0.3"])
    assert args.dataset == ["sbm"] and args.model == ["gcn"]
    assert kwargs["epochs"] == 5
    assert kwargs["hidden_size"] == 32
    assert kwargs["nhead"] == 4 and abs(kwargs["alpha"] - 0.3) < 1e-9


def test_automl_random_backend():
    from cogdl_tpu.automl import AutoML

    out = AutoML("sbm", "gcn", seeds=[0], n_trials=2, epochs=4,
                 search_space={"hidden_size": ("categorical", [16, 32])}).run()
    assert out["best_params"]["hidden_size"] in (16, 32)
    assert 0 <= out["best_value"] <= 1


def test_stats_pipeline(capsys):
    rows = pipeline("stats")(["sbm"])
    assert rows[0]["nodes"] == 400
    assert "edges" in capsys.readouterr().out


def test_generate_emb_pipeline():
    emb = pipeline("generate-emb")(dataset="sbm", model="spectral",
                                   hidden_size=8)
    assert emb.shape == (400, 8)


def test_recommendation_end_to_end():
    from cogdl_tpu.experiments import train

    r = train("rec-synthetic", "lightgcn", seed=0, epochs=30,
              weight_decay=0.0, eval_step=10, patience=30)
    assert r["test_recall"] > 0.3  # well above 20/100 random


def test_unknown_app():
    with pytest.raises(ValueError):
        pipeline("nope")
