"""Trainer auxiliary subsystems: checkpoint/resume, bf16 training, loggers,
multi-stage hooks."""

import os

import numpy as np
import pytest

from cogdl_tpu.experiments import train
from cogdl_tpu.trainer.checkpoint import (
    load_checkpoint,
    save_checkpoint,
    save_embedding,
    load_embedding,
)


def test_checkpoint_roundtrip(tmp_path):
    path = str(tmp_path / "ck" / "model.ckpt")
    params = {"w": np.arange(6, dtype=np.float32).reshape(2, 3)}
    save_checkpoint(path, params, opt_state={"m": np.ones(3)}, epoch=7)
    ck = load_checkpoint(path)
    np.testing.assert_array_equal(ck["params"]["w"], params["w"])
    assert ck["epoch"] == 7


def test_train_saves_and_resumes(tmp_path):
    path = str(tmp_path / "model.ckpt")
    r1 = train("sbm", "gcn", seed=0, epochs=5, checkpoint_path=path)
    assert os.path.exists(path)
    # resume warm: should start from saved params and still work
    r2 = train("sbm", "gcn", seed=0, epochs=2, checkpoint_path=path,
               resume_training=True)
    assert r2["test_acc"] >= 0.5


def test_bf16_training():
    r = train("sbm", "gcn", seed=0, epochs=15, bf16=True)
    assert r["test_acc"] > 0.8


def test_bf16_scan_chained_steps_finite():
    """Regression fence for the bench.py --bf16 path: K train steps chained
    inside ONE jit via lax.scan with bf16 activations. This is numerically
    fine (asserted here) — the silent crash seen on the axon relay backend
    (CLAUDE.md 'scan+bf16') is a backend fault, not a framework one; this
    test pins the framework side so any future failure localises to the
    backend."""
    import jax
    import jax.numpy as jnp
    import optax

    from cogdl_tpu.datasets import build_dataset
    from cogdl_tpu.models import build_model
    from cogdl_tpu.utils.evaluator import masked_cross_entropy

    ds = build_dataset("sbm")
    g = ds.graph
    model = build_model("gcn", in_features=ds.num_features,
                        out_features=ds.num_classes, hidden_size=16,
                        dropout=0.0)
    rng = jax.random.PRNGKey(0)
    params = model.init(rng, g, g.x, training=False)["params"]
    tx = optax.adam(1e-2)
    opt = tx.init(params)

    def step(p, o):
        def loss_fn(p):
            pb = jax.tree.map(
                lambda a: a.astype(jnp.bfloat16)
                if a.dtype == jnp.float32 else a, p)
            gb = g.replace(x=g.x.astype(jnp.bfloat16))
            logits = model.apply({"params": pb}, gb, gb.x, training=True,
                                 rngs={"dropout": rng})
            return masked_cross_entropy(logits.astype(jnp.float32), g.y,
                                        g.train_mask & g.node_mask())

        loss, grads = jax.value_and_grad(loss_fn)(p)
        grads = jax.tree.map(lambda a: a.astype(jnp.float32), grads)
        upd, o = tx.update(grads, o, p)
        return optax.apply_updates(p, upd), o, loss

    @jax.jit
    def run(p, o):
        def body(carry, _):
            p, o = carry
            p, o, loss = step(p, o)
            return (p, o), loss

        (p, o), losses = jax.lax.scan(body, (p, o), None, length=8)
        return losses

    losses = run(params, opt)
    assert jnp.isfinite(losses).all()
    assert float(losses[-1]) < float(losses[0])


def test_print_logger(capsys):
    train("sbm", "gcn", seed=0, epochs=3, logger="print")
    assert "val_acc" in capsys.readouterr().out


def test_embedding_save_load(tmp_path):
    p = str(tmp_path / "emb.npy")
    emb = np.random.default_rng(0).normal(size=(5, 4)).astype(np.float32)
    save_embedding(p, emb)
    np.testing.assert_array_equal(load_embedding(p), emb)


def test_multi_stage_hooks():
    calls = []

    from cogdl_tpu.datasets import build_dataset
    from cogdl_tpu.models import build_model
    from cogdl_tpu.trainer.trainer import Trainer, TrainerConfig
    from cogdl_tpu.wrappers.node_classification import NodeClfWrapper

    ds = build_dataset("sbm")

    class StagedWrapper(NodeClfWrapper):
        num_stages = 3

        def pre_stage(self, stage, graph, variables):
            calls.append(("pre", stage))
            return None

        def post_stage(self, stage, graph, variables):
            calls.append(("post", stage))

    model = build_model("gcn", in_features=ds.num_features,
                        out_features=ds.num_classes)
    w = StagedWrapper(model, ds)
    res = Trainer(TrainerConfig(epochs=2)).run(w, ds.graph)
    assert [c for c in calls if c[0] == "pre"] == [("pre", 0), ("pre", 1), ("pre", 2)]
    assert [c for c in calls if c[0] == "post"] == [("post", 0), ("post", 1), ("post", 2)]


def test_nan_guard_rolls_back_and_raises():
    """Failure detection: a diverging loss rolls back to the best snapshot;
    persistent divergence raises instead of silently training on NaNs
    (the reference has no failure detection at all — SURVEY.md §5)."""
    import jax.numpy as jnp
    import pytest

    from cogdl_tpu.datasets import build_dataset
    from cogdl_tpu.models import build_model
    from cogdl_tpu.trainer.trainer import Trainer, TrainerConfig
    from cogdl_tpu.wrappers import fetch_wrapper

    ds = build_dataset("sbm", num_nodes=120)
    model = build_model("gcn", in_features=ds.num_features,
                        out_features=ds.num_classes, hidden_size=8)
    wrapper = fetch_wrapper("node_classification")(model, ds)
    orig_loss = wrapper.loss

    def poisoned(variables, batch, rng, training=True):
        loss, upd = orig_loss(variables, batch, rng, training)
        # overflow to inf immediately — value-level divergence (a python
        # counter would only tick at trace time)
        return loss * jnp.float32(1e38) * jnp.float32(1e38), upd

    wrapper.loss = poisoned
    with pytest.raises(RuntimeError, match="diverged"):
        Trainer(TrainerConfig(epochs=30, eval_step=1,
                              nan_guard_retries=2)).run(wrapper, ds.graph)
