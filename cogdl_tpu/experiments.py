"""Experiment API — rebuild of reference cogdl/experiments.py:335 ``experiment``.

``experiment(dataset, model, seed=[...], **hyperparams)`` runs the variant grid
dataset × model × seed, trains each with the task wrapper matched to the model
(reference wrappers/default_match.py), and returns/prints a results table.
Typed kwargs replace the reference's argparse/sys.argv machinery
(options.py:126); BEST_CONFIGS-style per-(model,dataset) overrides live in
cogdl_tpu.configs.
"""

from __future__ import annotations

import itertools
import os
from collections import defaultdict
from dataclasses import fields as dc_fields
from typing import Any, Dict, List, Optional, Sequence, Union

import numpy as np

from .configs import BEST_CONFIGS
from .datasets import build_dataset
from .datasets.dataset import Dataset
from .models import SUPPORTED_MODELS, build_model
from .trainer.trainer import Trainer, TrainerConfig
from .wrappers import default_wrapper_for, fetch_wrapper

TRAINER_KEYS = {f.name for f in dc_fields(TrainerConfig)}


def _as_list(x) -> List:
    if isinstance(x, (list, tuple)):
        return list(x)
    return [x]


def gen_variants(datasets, models, seeds):
    """Cartesian variant grid (reference experiments.py:233)."""
    return list(itertools.product(_as_list(datasets), _as_list(models), _as_list(seeds)))


def set_best_config(model: str, dataset: str, kwargs: Dict) -> Dict:
    """Overlay per-(model,dataset) tuned hyper-parameters under user kwargs
    (reference experiments.py:79 + configs.py). Precedence:
    defaults < best-config < user kwargs."""
    merged = {}
    merged.update(BEST_CONFIGS.get(model, {}).get("general", {}))
    merged.update(BEST_CONFIGS.get(model, {}).get(dataset, {}))
    merged.update(kwargs)
    return merged


def _setup_variant(ds, model, seed, wrapper, kwargs):
    """Shared variant setup for the sequential and vmapped-seed paths:
    split kwargs by consumer and build the (wrapper, trainer_kwargs) pair —
    or an embedding-style wrapper that owns its own loop."""
    wrapper_name = wrapper or default_wrapper_for(model)
    wrapper_cls = fetch_wrapper(wrapper_name)

    import inspect

    wrapper_keys = set(inspect.signature(wrapper_cls.__init__).parameters) - {
        "self", "model", "dataset", "kwargs"}
    trainer_kwargs = {k: v for k, v in kwargs.items() if k in TRAINER_KEYS}
    wrapper_kwargs = {k: v for k, v in kwargs.items()
                      if k in wrapper_keys and k not in TRAINER_KEYS}
    model_kwargs = {k: v for k, v in kwargs.items()
                    if k not in TRAINER_KEYS and k not in wrapper_keys}
    trainer_kwargs["seed"] = seed
    wrapper_kwargs.setdefault("seed", seed) if "seed" in wrapper_keys else None

    if hasattr(wrapper_cls, "run_embedding"):
        # embedding-style wrappers own their whole train/eval loop
        w = wrapper_cls(model_name=model, dataset=ds, **wrapper_kwargs,
                        **model_kwargs)
        return w, None, trainer_kwargs

    out_features = ds.num_classes
    if out_features is None:
        # unlabeled datasets (e.g. ogbl link graphs): the model head is an
        # embedding, not a classifier — size it like the hidden layers
        out_features = model_kwargs.get("hidden_size", 64)
    mdl = build_model(
        model,
        in_features=ds.num_features,
        out_features=out_features,
        **model_kwargs,
    )
    w = wrapper_cls(mdl, dataset=ds, **wrapper_kwargs)
    return w, mdl, trainer_kwargs


def train(
    dataset: Union[str, Dataset],
    model: str,
    seed: int = 0,
    wrapper: Optional[str] = None,
    use_best_config: bool = False,
    export_path: Optional[str] = None,
    **kwargs,
) -> Dict[str, float]:
    """Train one variant end-to-end (reference experiments.py:92 ``train``).

    ``export_path``: after training, AOT-export the trained forward to a
    StableHLO serving artifact (:mod:`cogdl_tpu.serve`); full-batch
    ``(graph, x)``-signature models only. With a seed grid, the last
    variant's weights win."""
    ds = build_dataset(dataset) if isinstance(dataset, str) else dataset
    ds_name = ds.name if isinstance(ds, Dataset) else str(dataset)
    if use_best_config:
        kwargs = set_best_config(model, ds_name, kwargs)

    w, mdl, trainer_kwargs = _setup_variant(ds, model, seed, wrapper, kwargs)
    if mdl is None:
        return w.run_embedding()
    graph = ds.graph
    trainer = Trainer(TrainerConfig(**trainer_kwargs))
    result = trainer.run(w, graph)
    variables = result.pop("_variables", None)
    g_served = result.pop("_graph", graph)
    if export_path:
        from .serve import export_model

        # export against the EXACT frame the trainer trained on (the
        # wrapper-prepared graph, incl. TPU kernel layouts) — re-preparing
        # here would repeat minutes of host layout work at OGB scale and
        # could diverge from the trained frame
        export_model(mdl, variables, g_served, export_path)
    return result


def train_seeds_vmapped(
    dataset: Union[str, Dataset],
    model: str,
    seeds: Sequence[int],
    wrapper: Optional[str] = None,
    use_best_config: bool = False,
    export_path: Optional[str] = None,
    **kwargs,
) -> List[Dict[str, float]]:
    """All seeds of one (dataset, model) variant trained in ONE vmapped jit
    (the TPU answer to the reference's mp.Pool variant farm,
    experiments.py:277-294 — SURVEY §7's "vmap-over-configs"). Per-seed
    results match :func:`train` run sequentially; see
    :mod:`cogdl_tpu.trainer.vmap_seeds`."""
    from .trainer.vmap_seeds import VmapSeedTrainer

    ds = build_dataset(dataset) if isinstance(dataset, str) else dataset
    ds_name = ds.name if isinstance(ds, Dataset) else str(dataset)
    if use_best_config:
        kwargs = set_best_config(model, ds_name, kwargs)
    w, mdl, trainer_kwargs = _setup_variant(ds, model, int(seeds[0]), wrapper,
                                            kwargs)
    if mdl is None:
        raise ValueError("vmap_seeds does not support embedding-loop "
                         "wrappers; use sequential seeds")
    trainer = VmapSeedTrainer(TrainerConfig(**trainer_kwargs))
    results = trainer.run_seeds(w, ds.graph, [int(s) for s in seeds])
    for res in results:
        variables = res.pop("_variables", None)
        g_served = res.pop("_graph", ds.graph)
    if export_path:
        from .serve import export_model

        # with a seed grid the LAST variant's weights win (same contract as
        # the sequential path)
        export_model(mdl, variables, g_served, export_path)
    return results


def train_grid_vmapped(
    dataset: Union[str, Dataset],
    model: str,
    configs: Sequence[Dict[str, Any]],
    wrapper: Optional[str] = None,
    use_best_config: bool = False,
    **kwargs,
) -> List[Dict[str, float]]:
    """Train a whole hyperparameter grid — one config dict per lane, keys
    ⊆ {seed, lr, weight_decay} — in ONE vmapped program (the rest of
    SURVEY §7's "vmap-over-configs": beyond seeds, the optimizer's
    learning_rate/weight_decay ride as per-lane state leaves via
    optax.inject_hyperparams). Model-shape hypers (hidden_size, ...) change
    the compiled program and must stay sequential."""
    from .trainer.vmap_seeds import VmapSeedTrainer

    ds = build_dataset(dataset) if isinstance(dataset, str) else dataset
    ds_name = ds.name if isinstance(ds, Dataset) else str(dataset)
    if use_best_config:
        kwargs = set_best_config(model, ds_name, kwargs)
    seed0 = int(configs[0].get("seed", kwargs.get("seed", 0)))
    w, mdl, trainer_kwargs = _setup_variant(ds, model, seed0, wrapper,
                                            kwargs)
    if mdl is None:
        raise ValueError("vmap grids do not support embedding-loop "
                         "wrappers; use sequential variants")
    trainer = VmapSeedTrainer(TrainerConfig(**trainer_kwargs))
    results = trainer.run_grid(w, ds.graph, configs)
    for res in results:
        res.pop("_variables", None)
        res.pop("_graph", None)
    return results


def raw_experiment(datasets, models, seeds=(1,), vmap_seeds: bool = False,
                   **kwargs) -> Dict[str, List[Dict]]:
    """Run the full variant grid; returns variant → list of per-seed results
    (reference experiments.py:269). Each named dataset is built ONCE and
    shared across its model × seed variants — re-parsing per seed wastes
    minutes at OGB scale.

    ``vmap_seeds=True`` trains each (dataset, model)'s whole seed list in
    one vmapped jit (:func:`train_seeds_vmapped`), falling back per variant
    to the sequential path when the wrapper needs host work per epoch."""
    # sharing contract: one built Dataset is reused across every model × seed
    # variant, so training must never mutate the dataset/graph in place —
    # wrappers return transformed COPIES (prepare_graph) and never write back
    built: Dict[int, Any] = {}

    def resolve(ds):
        key = ds if isinstance(ds, str) else id(ds)
        if key not in built:
            built[key] = build_dataset(ds) if isinstance(ds, str) else ds
        return built[key]

    variants = gen_variants(datasets, models, seeds)
    results = defaultdict(list)
    base_export = kwargs.get("export_path")
    multi = len({(d, m) for d, m, _ in variants}) > 1

    def _variant_export(ds, mdl):
        if base_export and multi:
            # a model/dataset grid would silently overwrite one artifact —
            # derive a per-variant filename instead (split the extension on
            # the BASENAME only: a dot in a directory component must not
            # become the split point)
            head, base = os.path.split(base_export)
            stem, ext = os.path.splitext(base)
            mname = mdl if isinstance(mdl, str) else getattr(
                mdl, "name", type(mdl).__name__)
            tag = f"{ds if isinstance(ds, str) else 'dataset'}-{mname}"
            kwargs["export_path"] = os.path.join(head, f"{stem}-{tag}{ext}")

    seed_list = _as_list(seeds)
    if vmap_seeds and len(seed_list) > 1:
        for ds, mdl in dict.fromkeys((d, m) for d, m, _ in variants):
            _variant_export(ds, mdl)
            key = (ds if isinstance(ds, str) else getattr(ds, "name",
                                                          "dataset"), mdl)
            try:
                results[key] = train_seeds_vmapped(
                    resolve(ds), mdl, seed_list, **kwargs)
            except ValueError as e:
                if "vmap_seeds" not in str(e):
                    raise
                for seed in seed_list:
                    results[key].append(train(resolve(ds), mdl, seed=seed,
                                              **kwargs))
        return dict(results)

    for ds, mdl, seed in variants:
        _variant_export(ds, mdl)
        res = train(resolve(ds), mdl, seed=seed, **kwargs)
        key = (ds if isinstance(ds, str) else getattr(ds, "name", "dataset"), mdl)
        results[key].append(res)
    return dict(results)


def output_results(results: Dict, metrics: Sequence[str] = ("test_acc", "val_acc")):
    """Tabulated mean±std per variant (reference experiments.py:245)."""
    col_names = ["Variant"] + [m for m in metrics]
    rows = []
    for (ds, mdl), runs in results.items():
        row = [f"({ds!r}, {mdl!r})"]
        for m in metrics:
            vals = [r[m] for r in runs if m in r]
            if vals:
                row.append(f"{np.mean(vals):.4f}±{np.std(vals):.4f}")
            else:
                row.append("—")
        rows.append(row)
    widths = [max(len(str(r[i])) for r in rows + [col_names]) for i in range(len(col_names))]
    lines = ["  ".join(str(c).ljust(w) for c, w in zip(col_names, widths))]
    lines += ["  ".join(str(c).ljust(w) for c, w in zip(r, widths)) for r in rows]
    table = "\n".join(lines)
    print(table)
    return table


def experiment(
    dataset,
    model,
    seed: Union[int, Sequence[int]] = 1,
    search_space=None,
    n_trials: int = 3,
    seeds: Union[None, int, Sequence[int]] = None,
    **kwargs,
):
    """The one-call API (reference experiments.py:335).

    >>> experiment(dataset="sbm", model="gcn", epochs=50)

    ``seeds`` is accepted as an alias for ``seed`` (the reference's keyword).
    """
    if seeds is not None:
        seed = seeds
    if search_space is not None:
        from .automl import auto_experiment

        return auto_experiment(dataset, model, seeds=_as_list(seed),
                               search_space=search_space, n_trials=n_trials,
                               **kwargs)
    results = raw_experiment(dataset, model, seeds=_as_list(seed), **kwargs)
    output_results(results)
    return results
