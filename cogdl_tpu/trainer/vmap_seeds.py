"""Seed-parallel training: every seed's whole training run in ONE jitted,
vmapped program.

The reference farms independent variants out to GPU processes with an
mp.Pool (reference cogdl/experiments.py:277-294). The TPU-native answer is
functional transforms, not processes: stack per-seed params / optimizer
state on a leading axis and ``jax.vmap`` the jitted train step — S seeds
train in the same XLA program, batching every matmul over the seed axis and
leaving the chip busy instead of ~80% idle on microsecond-sized steps.

Semantics match :meth:`Trainer.run` exactly per seed (verified by parity
tests): identical per-seed PRNG chains, strict-improvement best-snapshot
tracking, per-seed patience early stopping (a stopped seed keeps training —
dead weight is cheaper than unbatching — but its best snapshot is frozen),
and the nan-guard rollback, all expressed as per-seed ``where`` selects over
the stacked trees.

Supported wrappers: single-batch jittable ones (loss/evaluate pure, no
stages, no per-epoch host work) — the full-batch node/graph-level families.
``train_seeds_vmapped`` raises for the rest; ``experiments.raw_experiment``
falls back to the sequential path.
"""

from __future__ import annotations

import time
from typing import Dict, List, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import optax

from .trainer import Trainer, TrainerConfig, build_optimizer


def _seed_select(mask_s: jnp.ndarray, new_tree, old_tree):
    """Per-seed tree select: leaves are [S, ...]; mask is [S] bool."""

    def sel(new, old):
        m = mask_s.reshape((mask_s.shape[0],) + (1,) * (new.ndim - 1))
        return jnp.where(m, new, old)

    return jax.tree.map(sel, new_tree, old_tree)


def vmap_supported(wrapper, cfg: TrainerConfig) -> bool:
    """True when the wrapper trains as one jittable (loss, evaluate) pair on
    a single full batch — the contract the vmapped path batches over."""
    return not (
        cfg.attack
        or getattr(wrapper, "num_stages", 1) > 1
        or hasattr(wrapper, "pre_stage")
        or hasattr(wrapper, "epoch_xs")
        or hasattr(wrapper, "run_embedding")
        or getattr(wrapper, "refresh_per_epoch", False)
        or not getattr(wrapper, "jit_eval", True)
        # config features the vmapped loop does not implement — reject
        # loudly so raw_experiment falls back to the sequential path
        # instead of silently dropping a checkpoint/log contract
        or cfg.checkpoint_path
        or cfg.resume_training
        or cfg.logger
        or cfg.profile_dir
    )


def _grid_optimizer(cfg: TrainerConfig):
    """Optimizer whose learning_rate/weight_decay are STATE leaves
    (optax.inject_hyperparams) — under vmap each config lane carries its
    own values, so a hyperparameter grid trains in one program (the full
    SURVEY §7 "vmap-over-configs" story, beyond seeds)."""
    if cfg.lr_schedule:
        raise ValueError(
            "vmap_grid supports constant learning rates only (an lr "
            "schedule closure cannot vary per vmapped lane) — drop "
            "lr_schedule or use sequential variants")

    def factory(learning_rate, weight_decay):
        if cfg.optimizer == "adamw":
            tx = optax.adamw(learning_rate, weight_decay=weight_decay)
        elif cfg.optimizer == "sgd":
            tx = optax.sgd(learning_rate, momentum=0.9)
        else:
            tx = optax.chain(optax.add_decayed_weights(weight_decay),
                             optax.adam(learning_rate))
        if cfg.grad_clip:
            tx = optax.chain(optax.clip_by_global_norm(cfg.grad_clip), tx)
        return tx

    return optax.inject_hyperparams(factory)(
        learning_rate=cfg.lr, weight_decay=cfg.weight_decay)


class VmapSeedTrainer(Trainer):
    """Trainer whose :meth:`run_seeds` trains all seeds at once and
    :meth:`run_grid` whole (seed, lr, weight_decay) config grids."""

    def run_seeds(self, wrapper, graph, seeds: Sequence[int]) -> List[Dict]:
        if self.cfg.activation_compression:
            from ..ops import actnn

            prev = actnn.set_compression(True)
            try:
                return self._run_seeds(wrapper, graph, seeds)
            finally:
                actnn.set_compression(prev)
        return self._run_seeds(wrapper, graph, seeds)

    def run_grid(self, wrapper, graph, configs: Sequence[Dict]) -> List[Dict]:
        """Train one lane per config dict (keys ⊆ {seed, lr, weight_decay};
        missing keys default to the TrainerConfig) — all lanes in ONE
        vmapped program. Returns per-config result dicts in order."""
        cfg = self.cfg
        seeds = [int(c.get("seed", cfg.seed)) for c in configs]
        lrs = np.asarray([float(c.get("lr", cfg.lr)) for c in configs],
                         np.float32)
        wds = np.asarray([float(c.get("weight_decay", cfg.weight_decay))
                          for c in configs], np.float32)
        unknown = {k for c in configs for k in c} - {"seed", "lr",
                                                     "weight_decay"}
        if unknown:
            raise ValueError(
                f"vmapped grids vary seed/lr/weight_decay only (got "
                f"{sorted(unknown)}); model-shape hypers change the "
                "program — run those variants sequentially")
        return self._run_seeds(wrapper, graph, seeds,
                               hyper_lr=jnp.asarray(lrs),
                               hyper_wd=jnp.asarray(wds))

    def _run_seeds(self, wrapper, graph, seeds: Sequence[int],
                   hyper_lr=None, hyper_wd=None) -> List[Dict]:
        cfg = self.cfg
        if not vmap_supported(wrapper, cfg):
            raise ValueError(
                f"wrapper {type(wrapper).__name__} (or this TrainerConfig) "
                "needs per-epoch host work — vmap_seeds supports single-"
                "batch jittable wrappers only; use sequential seeds")
        if hasattr(wrapper, "prepare_graph"):
            graph = wrapper.prepare_graph(graph)
        batch = graph
        if hasattr(wrapper, "train_batches"):
            batches = wrapper.train_batches(graph)
            if len(batches) != 1:
                raise ValueError(
                    f"wrapper {type(wrapper).__name__} trains on "
                    f"{len(batches)} batches per epoch — vmap_seeds "
                    "supports single-batch wrappers only; use sequential "
                    "seeds")
            batch = batches[0]
        S = len(seeds)
        t0 = time.time()

        # identical per-seed RNG chains to Trainer.run: key(seed) split once
        # for init, then once per epoch for the step
        rngs = jnp.stack([jax.random.PRNGKey(int(s)) for s in seeds])
        split_v = jax.vmap(jax.random.split)
        pair = split_v(rngs)
        rngs, init_rngs = pair[:, 0], pair[:, 1]

        variables = jax.jit(jax.vmap(
            lambda r, g: wrapper.init(r, g), in_axes=(0, None)))(
                init_rngs, graph)
        params = variables.get("params", {})
        model_state = {k: v for k, v in variables.items() if k != "params"}
        if hyper_lr is not None:
            tx = _grid_optimizer(cfg)

            def init_opt(p, lr, wd):
                st = tx.init(p)
                return st._replace(hyperparams={
                    **st.hyperparams, "learning_rate": lr,
                    "weight_decay": wd})

            opt_state = jax.vmap(init_opt)(params, hyper_lr, hyper_wd)
        else:
            tx = build_optimizer(cfg)
            opt_state = jax.vmap(tx.init)(params)

        def _cast_bf16(tree):
            return jax.tree.map(
                lambda a: a.astype(jnp.bfloat16)
                if hasattr(a, "dtype") and a.dtype == jnp.float32 else a,
                tree)

        # the batch/graph ride as jit ARGUMENTS (broadcast over the seed
        # axis), never as closures — a closed-over device array embeds as
        # an XLA constant and the TPU remote-compile relay rejects
        # non-toy-sized programs (CLAUDE.md; Trainer._run passes b/g the
        # same way)
        def one_step(p, ms, os_, b, sr):
            def loss_fn(pp):
                if cfg.bf16:
                    # match Trainer._run: bf16 compute incl. the features,
                    # f32 master weights
                    pp = _cast_bf16(pp)
                    b_ = (b.replace(x=b.x.astype(jnp.bfloat16))
                          if hasattr(b, "replace") and getattr(b, "x", None)
                          is not None else b)
                else:
                    b_ = b
                loss, updates = wrapper.loss(
                    {"params": pp, **ms}, b_, sr, training=True)
                return loss.astype(jnp.float32), updates

            (loss, updates), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(p)
            grads = jax.tree.map(lambda a: a.astype(jnp.float32), grads)
            upd, os2 = tx.update(grads, os_, p)
            return optax.apply_updates(p, upd), {**ms, **updates}, os2, loss

        train_step_v = jax.jit(jax.vmap(
            one_step, in_axes=(0, 0, 0, None, 0)))
        eval_v = jax.jit(jax.vmap(
            lambda p, ms, g: wrapper.evaluate({"params": p, **ms}, g),
            in_axes=(0, 0, None)))

        monitor = getattr(wrapper, "eval_metric", cfg.monitor)
        mode = getattr(wrapper, "eval_mode", cfg.monitor_mode)
        sign = 1.0 if mode == "max" else -1.0

        best = np.full(S, -np.inf)
        best_params, best_ms, best_opt = params, model_state, opt_state
        best_epoch = np.zeros(S, np.int64)
        patience_left = np.full(S, cfg.patience)
        stopped = np.zeros(S, bool)
        nan_rollbacks = np.zeros(S, np.int64)

        for epoch in range(cfg.epochs):
            pair = split_v(rngs)
            rngs, step_rngs = pair[:, 0], pair[:, 1]
            params, model_state, opt_state, losses = train_step_v(
                params, model_state, opt_state, batch, step_rngs)
            if (epoch + 1) % cfg.eval_step != 0:
                continue
            train_loss = np.asarray(losses, np.float64)
            finite = np.isfinite(train_loss)
            if cfg.nan_guard and not finite.all():
                bad = ~finite
                nan_rollbacks = np.where(bad, nan_rollbacks + 1,
                                         0 * nan_rollbacks)
                over = nan_rollbacks > cfg.nan_guard_retries
                if over.any():
                    raise RuntimeError(
                        f"training diverged for seeds "
                        f"{[seeds[i] for i in np.where(over)[0]]}: non-"
                        f"finite loss at epoch {epoch} persisted through "
                        f"{cfg.nan_guard_retries} rollbacks "
                        "(lower lr / enable grad_clip)")
                keep = jnp.asarray(finite)
                params = _seed_select(keep, params, best_params)
                model_state = _seed_select(keep, model_state, best_ms)
                opt_state = _seed_select(keep, opt_state, best_opt)
            elif cfg.nan_guard:
                nan_rollbacks[:] = 0
            metrics = eval_v(params, model_state, graph)
            if monitor not in metrics:
                raise KeyError(
                    f"early-stop monitor {monitor!r} not in eval metrics "
                    f"{sorted(map(str, metrics))}")
            score = np.asarray(metrics[monitor], np.float64) * sign
            live = finite & ~stopped
            improved = live & (score > best)
            best = np.where(improved, score, best)
            best_epoch = np.where(improved, epoch, best_epoch)
            imp = jnp.asarray(improved)
            best_params = _seed_select(imp, params, best_params)
            best_ms = _seed_select(imp, model_state, best_ms)
            best_opt = _seed_select(imp, opt_state, best_opt)
            patience_left = np.where(
                improved, cfg.patience,
                patience_left - np.where(live, cfg.eval_step, 0))
            stopped |= patience_left <= 0
            if stopped.all():
                break

        final = eval_v(best_params, best_ms, graph)
        wall = time.time() - t0
        results = []
        fin = {k: np.asarray(v) for k, v in final.items()}
        for i in range(S):
            res = {k: float(v[i]) for k, v in fin.items()}
            res["best_epoch"] = int(best_epoch[i])
            res["train_time"] = wall  # shared program: wall clock for ALL seeds
            res["_variables"] = jax.tree.map(
                lambda a: a[i], {"params": best_params, **best_ms})
            res["_graph"] = graph
            results.append(res)
        return results
