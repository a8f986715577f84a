"""Training runtime — the TPU-native replacement for the reference Trainer
(cogdl/trainer/trainer.py:56-562).

Design: ONE jitted ``train_step(state, batch) → (state, loss)`` containing
loss, grads, optax update and mutable-collection updates; a thin Python epoch
driver handles early stopping, best-parameter snapshots (device-side copy, not
the reference's ``deepcopy`` at trainer.py:396), checkpointing, and logging.
Evaluation is a second jitted function returning exact metric scalars.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import Any, Callable, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax


@dataclass
class TrainerConfig:
    epochs: int = 200
    lr: float = 1e-2
    weight_decay: float = 5e-4
    patience: int = 100
    eval_step: int = 1
    seed: int = 0
    monitor: str = "val_acc"          # early-stop metric
    monitor_mode: str = "max"
    grad_clip: Optional[float] = None
    optimizer: str = "adam"           # adam | adamw | sgd
    lr_schedule: Optional[str] = None  # None | "cosine" | "linear" | "noam"
    warmup_steps: int = 0
    logger: Optional[Any] = None      # loggers.Logger instance or name
    log_path: str = "."
    progress: bool = False
    bf16: bool = False                # bf16 activations/compute, f32 master
    checkpoint_path: Optional[str] = None
    resume_training: bool = False
    # observability (the reference has none beyond CUDA allocator stats,
    # SURVEY.md §5): capture a jax.profiler trace of a few post-compile
    # epochs; inspect with scripts/profile_step.py --parse-only
    profile_dir: Optional[str] = None
    profile_epochs: int = 2
    # GRB adversarial-training hook (reference Trainer.attack loop,
    # trainer.py:346-379): per epoch, attack the CURRENT model and train on
    # the perturbed graph; final metrics include accuracy under attack.
    # Feature attacks (fgsm/pgd) keep shapes identical; injection writes
    # into the graph's padding region — either way the jitted step never
    # retraces.
    attack: Optional[str] = None       # None | "fgsm" | "pgd" | "injection"
    attack_every: int = 1
    attack_eps: float = 0.05
    # failure detection (the reference has none — a crashed run just hangs
    # or poisons the weights): when the train loss goes non-finite at an
    # eval point, roll back to the best snapshot and keep going; give up
    # loudly after nan_guard_retries rollbacks.
    nan_guard: bool = True
    nan_guard_retries: int = 3
    # ActNN-analog (reference third_party/actnn via operators/linear.py):
    # GCN-family dense layers keep an int8 per-row-scaled copy of their
    # input for the backward instead of the f32 activation, and relu keeps
    # a bool mask (ops/actnn.py) — ~4x smaller activation residuals where
    # HBM binds (products scale). Quantisation noise enters only dw.
    # Process-global switch read at trace time; not thread-safe across
    # concurrently-tracing trainers.
    activation_compression: bool = False


def build_optimizer(cfg: TrainerConfig) -> optax.GradientTransformation:
    """Optimizer + schedule factory (reference: per-wrapper setup_optimizer and
    utils/optimizer.py Noam/linear schedules)."""
    lr: Any = cfg.lr
    if cfg.lr_schedule == "cosine":
        lr = optax.cosine_decay_schedule(cfg.lr, decay_steps=max(cfg.epochs, 1))
    elif cfg.lr_schedule == "linear":
        lr = optax.linear_schedule(cfg.lr, 0.0, transition_steps=max(cfg.epochs, 1))
    elif cfg.lr_schedule == "noam":
        warm = max(cfg.warmup_steps, 1)
        lr = lambda step: cfg.lr * jnp.minimum(
            (step + 1.0) ** -0.5, (step + 1.0) * warm ** -1.5) * warm ** 0.5
    if cfg.optimizer == "adamw":
        tx = optax.adamw(lr, weight_decay=cfg.weight_decay)
    elif cfg.optimizer == "sgd":
        tx = optax.sgd(lr, momentum=0.9)
    else:
        tx = optax.chain(
            optax.add_decayed_weights(cfg.weight_decay) if cfg.weight_decay
            else optax.identity(),
            optax.adam(lr),
        )
    if cfg.grad_clip:
        tx = optax.chain(optax.clip_by_global_norm(cfg.grad_clip), tx)
    return tx


class Trainer:
    """Task-agnostic epoch driver around a wrapper's jitted loss/evaluate."""

    def __init__(self, cfg: Optional[TrainerConfig] = None, **kw):
        if cfg is None:
            cfg = TrainerConfig(**kw)
        self.cfg = cfg

    @staticmethod
    def _model_apply(wrapper):
        """Standard node-model application for the GRB attack hook; attacks
        differentiate the loss wrt features, so they need the plain
        (graph, x, training) forward."""
        model = getattr(wrapper, "model", None)
        if model is None or not hasattr(model, "apply"):
            raise ValueError(
                "TrainerConfig.attack requires a wrapper exposing a flax "
                "node model (model.apply(variables, graph, x, training)) — "
                f"got wrapper {type(wrapper).__name__}")

        def apply(variables, g):
            return model.apply(variables, g, g.x, training=False)

        return apply

    def _attack_graph(self, wrapper, graph, variables):
        from ..utils import grb

        cfg = self.cfg
        apply = self._model_apply(wrapper)
        # adversarial TRAINING perturbs the train nodes (the reference
        # points the attack at the train mask before grafting,
        # trainer.py:364-367)
        mask = graph.train_mask & graph.node_mask()
        if cfg.attack == "fgsm":
            return grb.fgsm_attack_features(apply, variables, graph,
                                            epsilon=cfg.attack_eps, mask=mask)
        if cfg.attack == "pgd":
            return grb.pgd_attack_features(apply, variables, graph,
                                           epsilon=cfg.attack_eps, mask=mask)
        if cfg.attack == "injection":
            return grb.random_injection_attack(graph, seed=cfg.seed)
        if cfg.attack == "tdgia":
            return grb.tdgia_injection_attack(apply, variables, graph,
                                              seed=cfg.seed)
        if cfg.attack == "speit":
            return grb.speit_injection_attack(apply, variables, graph,
                                              seed=cfg.seed)
        # modification family (edge flips under budget, utils/grb_modification)
        # — adversarial training targets the TRAIN nodes, like the feature
        # attacks above
        if cfg.attack == "dice":
            return grb.dice_modification_attack(graph, seed=cfg.seed,
                                                mask=mask)
        if cfg.attack == "flip":
            return grb.flip_modification_attack(graph, mask=mask)
        if cfg.attack == "rand_flip":
            return grb.rand_modification_attack(graph, seed=cfg.seed,
                                                mask=mask)
        if cfg.attack == "fga":
            return grb.fga_modification_attack(apply, variables, graph,
                                               seed=cfg.seed, mask=mask)
        if cfg.attack == "prbcd":
            return grb.prbcd_modification_attack(apply, variables, graph,
                                                 seed=cfg.seed, mask=mask)
        raise ValueError(
            f"unknown attack {cfg.attack!r}; known: fgsm | pgd | injection "
            "| tdgia | speit | dice | flip | rand_flip | fga | prbcd")

    def run(self, wrapper, graph) -> Dict[str, float]:
        cfg = self.cfg
        if cfg.activation_compression:
            from ..ops import actnn

            prev = actnn.set_compression(True)
            try:
                return self._run(wrapper, graph)
            finally:
                actnn.set_compression(prev)
        return self._run(wrapper, graph)

    def _run(self, wrapper, graph) -> Dict[str, float]:
        cfg = self.cfg
        if cfg.bf16 and jax.devices()[0].platform not in ("cpu",):
            import warnings

            # measured 2026-08-21 (BENCH r2): bf16 gather TABLES fall off the
            # TPU VMEM-staged gather path — 19x slower on SpMM-bound GCN at
            # 100k (475 vs 24.8 ms) and 3.7x at products scale. bf16 only
            # helps matmul-bound models here.
            warnings.warn(
                "Trainer(bf16=True) on TPU: gather-bound GNNs (GCN/GAT/SAGE "
                "message passing) measured up to 19x SLOWER in bf16 on this "
                "backend because bf16 gather tables miss the VMEM-staged "
                "fast path; keep f32 unless the model is matmul-bound.",
                stacklevel=2)
        if hasattr(wrapper, "prepare_graph"):
            graph = wrapper.prepare_graph(graph)
        rng = jax.random.PRNGKey(cfg.seed)
        rng, init_rng = jax.random.split(rng)
        variables = wrapper.init(init_rng, graph)
        params = variables.get("params", {})
        resumed_opt, start_epoch = None, 0
        if cfg.resume_training and cfg.checkpoint_path:
            from .checkpoint import load_checkpoint

            try:
                ckpt = load_checkpoint(cfg.checkpoint_path)
                params = jax.tree.map(jnp.asarray, ckpt["params"])
                if ckpt.get("opt_state") is not None:
                    resumed_opt = ckpt["opt_state"]
                start_epoch = int(ckpt.get("epoch", 0))
            except FileNotFoundError:
                pass
        model_state = {k: v for k, v in variables.items() if k != "params"}
        tx = build_optimizer(cfg)
        opt_state = tx.init(params)
        if resumed_opt is not None:
            # exact resume (checkpoint.py contract): same treedef, restored
            # moments/step — fall back to fresh state on optimizer change
            try:
                opt_state = jax.tree.unflatten(
                    jax.tree.structure(opt_state),
                    [jnp.asarray(v) for v in jax.tree.leaves(resumed_opt)])
            except Exception:
                pass

        def _cast_bf16(tree):
            return jax.tree.map(
                lambda a: a.astype(jnp.bfloat16)
                if hasattr(a, "dtype") and a.dtype == jnp.float32 else a, tree)

        @jax.jit
        def train_step(params, model_state, opt_state, g, step_rng):
            def loss_fn(p):
                if cfg.bf16:
                    # bf16 compute, f32 master weights (reference fp16 AMP,
                    # trainer.py:327,511-533 — bf16 needs no GradScaler)
                    p = _cast_bf16(p)
                    g_ = (g.replace(x=g.x.astype(jnp.bfloat16))
                          if hasattr(g, "replace") and getattr(g, "x", None)
                          is not None else g)
                else:
                    g_ = g
                loss, updates = wrapper.loss(
                    {"params": p, **model_state}, g_, step_rng, training=True)
                return loss.astype(jnp.float32), updates

            (loss, updates), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
            grads = jax.tree.map(lambda a: a.astype(jnp.float32), grads)
            upd, opt_state2 = tx.update(grads, opt_state, params)
            params2 = optax.apply_updates(params, upd)
            new_model_state = {**model_state, **updates}
            return params2, new_model_state, opt_state2, loss

        # TPU-native epoch scan: wrappers exposing `epoch_xs(graph)` +
        # `make_batch(graph, x)` (e.g. the on-device sampler) train a WHOLE
        # epoch inside one jitted lax.scan — one dispatch + one readback per
        # epoch instead of per batch, which matters when the host link adds
        # ~27 ms RTT per call. Falls back to the per-batch loop under
        # adversarial training (the attack rebuilds graphs host-side).
        scan_epochs = (hasattr(wrapper, "epoch_xs")
                       and hasattr(wrapper, "make_batch")
                       and not cfg.attack)

        @jax.jit
        def train_epoch(params, model_state, opt_state, g, xs, rng):
            def body(carry, x):
                params, model_state, opt_state, rng = carry
                rng, step_rng = jax.random.split(rng)

                def loss_fn(p):
                    if cfg.bf16:
                        p = _cast_bf16(p)
                    loss, updates = wrapper.loss(
                        {"params": p, **model_state},
                        wrapper.make_batch(g, x), step_rng, training=True)
                    return loss.astype(jnp.float32), updates

                (loss, updates), grads = jax.value_and_grad(
                    loss_fn, has_aux=True)(params)
                grads = jax.tree.map(lambda a: a.astype(jnp.float32), grads)
                upd, opt_state = tx.update(grads, opt_state, params)
                params = optax.apply_updates(params, upd)
                return (params, {**model_state, **updates}, opt_state,
                        rng), loss

            (params, model_state, opt_state, _), losses = jax.lax.scan(
                body, (params, model_state, opt_state, rng), xs)
            return params, model_state, opt_state, losses

        if getattr(wrapper, "jit_eval", True):
            @jax.jit
            def eval_step(params, model_state, g):
                return wrapper.evaluate({"params": params, **model_state}, g)
        else:
            def eval_step(params, model_state, g):
                return wrapper.evaluate({"params": params, **model_state}, g)

        refresh = getattr(wrapper, "refresh_per_epoch", False)
        # under scan_epochs the per-batch list is never consumed — building it
        # would also burn one epoch_seeds() shuffle from the sampler RNG and
        # skew reproducibility vs what the scan path actually trains on
        batches = (wrapper.train_batches(graph)
                   if hasattr(wrapper, "train_batches") and not scan_epochs
                   else [graph])

        monitor = getattr(wrapper, "eval_metric", cfg.monitor)
        mode = getattr(wrapper, "eval_mode", cfg.monitor_mode)
        sign = 1.0 if mode == "max" else -1.0
        best = -np.inf
        best_params = params
        best_model_state = model_state
        best_opt_state = opt_state
        best_epoch = 0
        nan_rollbacks = 0
        t0 = time.time()
        logger = cfg.logger
        if isinstance(logger, str):
            from ..loggers import build_logger

            logger = build_logger(logger, cfg.log_path)
        if logger is not None:
            logger.start()

        num_stages = getattr(wrapper, "num_stages", 1)
        for stage in range(num_stages):
            if hasattr(wrapper, "pre_stage"):
                # multi-stage contract (reference pre_stage/post_stage,
                # trainer.py:331-334; SAGN/M3S self-training)
                upd = wrapper.pre_stage(
                    stage, graph, {"params": best_params, **best_model_state})
                if upd is not None:
                    graph = upd
                    batches = wrapper.train_batches(graph)
            patience_left = cfg.patience
            profiling = False
            for epoch in range(start_epoch if stage == 0 else 0, cfg.epochs):
                if cfg.profile_dir and stage == 0:
                    # skip epoch 0 (compilation); trace the steady state
                    if epoch == 1:
                        jax.profiler.start_trace(cfg.profile_dir)
                        profiling = True
                    elif profiling and epoch == 1 + cfg.profile_epochs:
                        jax.profiler.stop_trace()
                        profiling = False
                if refresh and epoch > 0 and not scan_epochs:
                    batches = wrapper.train_batches(graph)
                if cfg.attack and epoch % max(cfg.attack_every, 1) == 0:
                    adv = self._attack_graph(
                        wrapper, graph, {"params": params, **model_state})
                    batches = wrapper.train_batches(adv)
                if scan_epochs:
                    rng, epoch_rng = jax.random.split(rng)
                    params, model_state, opt_state, losses = train_epoch(
                        params, model_state, opt_state, graph,
                        wrapper.epoch_xs(graph), epoch_rng)
                    losses = [losses]
                else:
                    losses = []
                    for b in batches:
                        rng, step_rng = jax.random.split(rng)
                        params, model_state, opt_state, loss = train_step(
                            params, model_state, opt_state, b, step_rng)
                        losses.append(loss)
                if (epoch + 1) % cfg.eval_step == 0:
                    train_loss = float(jnp.mean(jnp.stack(losses)))
                    if cfg.nan_guard:
                        if not np.isfinite(train_loss):
                            # CONSECUTIVE failures only — isolated blips
                            # recover and reset the counter below
                            nan_rollbacks += 1
                            if nan_rollbacks > cfg.nan_guard_retries:
                                raise RuntimeError(
                                    f"training diverged: non-finite loss at "
                                    f"epoch {epoch} persisted through "
                                    f"{cfg.nan_guard_retries} rollbacks "
                                    "(lower lr / enable grad_clip)")
                            params = best_params
                            model_state = best_model_state
                            opt_state = best_opt_state
                            print(f"nan_guard: non-finite loss at epoch "
                                  f"{epoch}; rolled back to epoch "
                                  f"{best_epoch} snapshot "
                                  f"({nan_rollbacks}/{cfg.nan_guard_retries})")
                            continue
                        nan_rollbacks = 0
                    metrics = eval_step(params, model_state, graph)
                    if monitor not in metrics:
                        raise KeyError(
                            f"early-stop monitor {monitor!r} not in eval "
                            f"metrics {sorted(map(str, metrics))} — best-"
                            "model tracking would silently keep the "
                            "initial parameters")
                    score = float(metrics[monitor]) * sign
                    if logger is not None:
                        logger.note(
                            {**{k: float(v) for k, v in metrics.items()},
                             "train_loss": train_loss},
                            stage * cfg.epochs + epoch)
                    if score > best:
                        best = score
                        best_params = params
                        best_model_state = model_state
                        best_opt_state = opt_state
                        best_epoch = epoch
                        patience_left = cfg.patience
                    else:
                        patience_left -= cfg.eval_step
                        if patience_left <= 0:
                            break
                if cfg.progress and (epoch % 20 == 0):
                    print(f"epoch {epoch}: "
                          f"loss={float(jnp.mean(losses[-1])):.4f}")
            if profiling:  # early stop landed inside the traced window
                jax.profiler.stop_trace()
            if hasattr(wrapper, "post_stage"):
                wrapper.post_stage(stage, graph,
                                   {"params": best_params, **best_model_state})

        if cfg.checkpoint_path:
            from .checkpoint import save_checkpoint

            save_checkpoint(cfg.checkpoint_path, best_params,
                            opt_state=best_opt_state, epoch=best_epoch)
        if logger is not None:
            logger.finish()
        final = eval_step(best_params, best_model_state, graph)
        result = {k: float(v) for k, v in final.items()}
        if cfg.attack:
            from ..utils.grb import evaluate_under_attack

            apply = self._model_apply(wrapper)
            result.update({
                f"attack_{k}": v for k, v in evaluate_under_attack(
                    apply, {"params": best_params, **best_model_state},
                    graph).items()})
        result["best_epoch"] = best_epoch
        result["train_time"] = time.time() - t0
        result["_variables"] = {"params": best_params, **best_model_state}
        result["_graph"] = graph   # the PREPARED frame (export needs it)
        return result
