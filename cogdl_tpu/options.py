"""CLI argument handling — rebuild of reference cogdl/options.py without the
sys.argv-rewriting hack (options.py:126): one typed parser whose unknown
flags flow through as model/trainer kwargs (the registry models consume typed
constructor kwargs instead of contributing add_args)."""

from __future__ import annotations

import argparse
from typing import Any, Dict, List, Optional, Tuple


def get_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser("cogdl_tpu", description="TPU-native graph learning")
    p.add_argument("--dataset", "-dt", nargs="+", default=["sbm"])
    p.add_argument("--model", "-m", nargs="+", default=["gcn"])
    p.add_argument("--seed", type=int, nargs="+", default=[1])
    p.add_argument("--epochs", type=int, default=None)
    p.add_argument("--lr", type=float, default=None)
    p.add_argument("--weight-decay", type=float, default=None)
    p.add_argument("--hidden-size", type=int, default=None)
    p.add_argument("--num-layers", type=int, default=None)
    p.add_argument("--dropout", type=float, default=None)
    p.add_argument("--patience", type=int, default=None)
    p.add_argument("--wrapper", type=str, default=None)
    p.add_argument("--use-best-config", action="store_true")
    p.add_argument("--bf16", action="store_true")
    p.add_argument("--checkpoint-path", type=str, default=None)
    p.add_argument("--resume-training", action="store_true")
    p.add_argument("--logger", type=str, default=None,
                   choices=[None, "none", "print", "tensorboard", "wandb"])
    p.add_argument("--n-trials", type=int, default=3)
    p.add_argument("--search", action="store_true",
                   help="run AutoML over the default search space")
    p.add_argument("--cpu", action="store_true",
                   help="force the CPU backend (reference --cpu flag)")
    p.add_argument("--devices", type=int, nargs="+", default=None,
                   help="(compat) ignored: JAX owns device placement")
    return p


def parse_kv_overrides(extra: List[str]) -> Dict[str, Any]:
    """Parse trailing ``key=value`` overrides with literal-eval typing."""
    import ast

    out = {}
    for item in extra:
        if "=" not in item:
            raise SystemExit(f"unrecognised argument {item!r} (want key=value)")
        k, v = item.split("=", 1)
        k = k.lstrip("-").replace("-", "_")
        try:
            out[k] = ast.literal_eval(v)
        except (ValueError, SyntaxError):
            out[k] = v
    return out


def parse_args_and_kwargs(argv: Optional[List[str]] = None
                          ) -> Tuple[argparse.Namespace, Dict[str, Any]]:
    parser = get_parser()
    args, extra = parser.parse_known_args(argv)
    kwargs = parse_kv_overrides(extra)
    for k in ("epochs", "lr", "weight_decay", "hidden_size", "num_layers",
              "dropout", "patience", "checkpoint_path", "logger"):
        v = getattr(args, k)
        if v is not None:
            kwargs[k] = v
    if args.bf16:
        kwargs["bf16"] = True
    if args.resume_training:
        kwargs["resume_training"] = True
    if args.use_best_config:
        kwargs["use_best_config"] = True
    if args.wrapper:
        kwargs["wrapper"] = args.wrapper
    return args, kwargs


def main(argv: Optional[List[str]] = None):
    """Entry point for ``python -m cogdl_tpu`` / scripts/train.py
    (reference scripts/train.py:1-9)."""
    args, kwargs = parse_args_and_kwargs(argv)
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    from .experiments import experiment

    if args.search:
        from .automl import auto_experiment

        return auto_experiment(args.dataset[0], args.model[0],
                               seeds=args.seed, n_trials=args.n_trials,
                               **{k: v for k, v in kwargs.items()
                                  if k != "use_best_config"})
    return experiment(dataset=args.dataset, model=args.model, seed=args.seed,
                      **kwargs)
