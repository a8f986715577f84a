"""Production inference: AOT-export a trained model's forward to a
self-contained StableHLO artifact and serve it without Python model code.

The reference has no deployment story (training scripts only); on TPU the
natural one is ``jax.export``: the jitted forward is lowered ONCE to
StableHLO bytes that reload in a clean process — no flax module, no model
registry, no re-trace — and execute on whatever devices the serving
process sees.

    from cogdl_tpu.serve import export_model, Predictor

    export_model(model, variables, graph, "gcn.stablehlo")   # at train time
    pred = Predictor("gcn.stablehlo", graph)                 # at serve time
    logits = pred()                                          # full-graph
    probs  = pred.predict_proba(nodes=[0, 5, 9])

Artifacts are shape-specialised (XLA semantics: static shapes); export one
artifact per padded graph shape — the padding contract means ONE artifact
serves every graph padded to that frame.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

_MAGIC = b"CGTPU1\n"


def _x_placeholder(graph):
    """The graph's x leaf replaced by a 0-row stub: features travel ONCE as
    the explicit ``x`` argument, not a second time inside the leaves."""
    return graph.replace(x=jnp.zeros((0,) + graph.x.shape[1:],
                                     graph.x.dtype))


def _forward_fn(model, treedef):
    # the Graph pytree's treedef (static meta incl.) is baked into the
    # lowered program as a closure — the artifact's call signature carries
    # only plain array pytrees, which jax.export can serialize
    def forward(variables, leaves, x):
        graph = jax.tree.unflatten(treedef, leaves).replace(x=x)
        return model.apply(variables, graph, x, training=False)

    return forward


def _write_artifact(path: str, data: bytes, variables, save_params: bool,
                    meta: Optional[dict] = None) -> None:
    """Shared atomic artifact write (MAGIC header, tmp+rename, optional
    params sidecar and .meta.json) — one place for the format."""
    head = os.path.dirname(path)
    if head:
        os.makedirs(head, exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(_MAGIC)
        f.write(data)
    os.replace(tmp, path)
    if meta is not None:
        import json

        with open(path + ".meta.json", "w") as f:
            json.dump(meta, f)
    if save_params:
        from .trainer.checkpoint import save_checkpoint

        save_checkpoint(path + ".params", variables)


def export_model(model, variables, graph, path: str,
                 platforms: Optional[Sequence[str]] = None,
                 save_params: bool = True) -> None:
    """Lower ``model.apply(variables, graph, graph.x)`` (inference mode) to
    serialized StableHLO at ``path``. ``platforms`` defaults to the current
    backend; pass e.g. ``("tpu", "cpu")`` to build one artifact servable on
    both. ``save_params`` (default) also writes the trained variables to
    ``path + ".params"`` so the artifact serves stand-alone —
    :class:`Predictor` auto-loads the sidecar."""
    from jax import export as jexport

    leaves, treedef = jax.tree.flatten(_x_placeholder(graph))
    fn = jax.jit(_forward_fn(model, treedef))
    kw = {"platforms": tuple(platforms)} if platforms else {}
    exp = jexport.export(fn, **kw)(variables, leaves, graph.x)
    _write_artifact(path, exp.serialize(), variables, save_params)


def load_exported(path: str):
    """The deserialized exported object; ``.call(variables, graph, x)``
    runs it."""
    from jax import export as jexport

    with open(path, "rb") as f:
        blob = f.read()
    if not blob.startswith(_MAGIC):
        raise ValueError(f"{path} is not a cogdl_tpu exported model")
    return jexport.deserialize(blob[len(_MAGIC):])


class Predictor:
    """Serve an exported artifact against a resident graph.

    Parameters are baked at construction (``variables``) or supplied per
    call; the graph rides as the static serving frame. ``jax.jit`` wraps
    the exported call so repeated predictions reuse one executable.
    """

    def __init__(self, path: str, graph, variables=None):
        self._exp = load_exported(path)
        self.graph = graph
        self._leaves = jax.tree.flatten(_x_placeholder(graph))[0]
        if variables is None and os.path.exists(path + ".params"):
            from .trainer.checkpoint import load_checkpoint

            variables = jax.tree.map(jnp.asarray,
                                     load_checkpoint(path + ".params")["params"])
        self.variables = variables
        self._call = jax.jit(self._exp.call)

    def __call__(self, x: Optional[jnp.ndarray] = None, variables=None):
        """Full-frame logits ``[n_pad, C]``."""
        v = variables if variables is not None else self.variables
        if v is None:
            raise ValueError("no variables: pass them here or at init")
        try:
            return self._call(v, self._leaves,
                              self.graph.x if x is None else x)
        except (ValueError, TypeError) as e:
            # keep the original exception TYPE (a TypeError from a malformed
            # variables pytree must not masquerade as a frame mismatch) and
            # append the likely-cause hint
            raise type(e)(
                f"{e}\nHint: if this is a shape/structure mismatch, the "
                "serving graph does not match the exported frame (artifacts "
                "are shape-specialised) — prepare the graph EXACTLY as at "
                "export time: same normalisation/self-loops, and on TPU "
                "the same prepare_spmm kernel layouts (experiment("
                "export_path=...) exports the wrapper-prepared frame)."
            ) from e

    def predict(self, nodes=None, x=None, variables=None):
        """Predicted class ids for ``nodes`` (default: all real nodes)."""
        logits = self(x, variables)
        if nodes is not None:
            logits = jnp.take(logits, jnp.asarray(nodes), axis=0,
                              mode="clip")
        else:
            logits = logits[: self.graph.num_nodes]
        return jnp.argmax(logits, axis=-1)

    def predict_proba(self, nodes=None, x=None, variables=None):
        logits = self(x, variables)
        if nodes is not None:
            logits = jnp.take(logits, jnp.asarray(nodes), axis=0,
                              mode="clip")
        else:
            logits = logits[: self.graph.num_nodes]
        return jax.nn.softmax(logits, axis=-1)


# ---------------------------------------------------------------------------
# Sampled (blocks-consuming) models
# ---------------------------------------------------------------------------

def _blocks_forward_fn(model, treedefs):
    # one treedef per hop block, baked as closure like _forward_fn's
    def forward(variables, block_leaves, x):
        blocks = [jax.tree.unflatten(td, lv)
                  for td, lv in zip(treedefs, block_leaves)]
        return model.apply(variables, blocks, x, training=False)

    return forward


def export_sampled_model(model, variables, blocks, x, path: str,
                         platforms: Optional[Sequence[str]] = None,
                         save_params: bool = True,
                         meta: Optional[dict] = None) -> None:
    """Export a blocks-consuming (sampled mini-batch) model.

    ``blocks`` is one shape-defining sampled batch (e.g. from
    ``NeighborSampler.epoch()``) and ``x`` the matching input-feature rows —
    every hop's block Graph is flattened and its treedef baked into the
    artifact, so the exported call signature is plain array pytrees:
    ``call(variables, block_leaves, x)``. Serving batches must have the
    sampler's static shapes (all batches of a NeighborSampler share them).
    ``meta`` (e.g. fanouts/batch_size) is written to ``path + ".meta.json"``
    so :class:`SampledPredictor` can rebuild a matching sampler."""
    from jax import export as jexport

    blocks = list(blocks)
    if blocks and getattr(blocks[0], "x", None) is not None:
        # features travel once, as the explicit x argument
        blocks[0] = _x_placeholder(blocks[0])
    flat = [jax.tree.flatten(b) for b in blocks]
    leaves = tuple(lv for lv, _ in flat)
    treedefs = tuple(td for _, td in flat)
    fn = jax.jit(_blocks_forward_fn(model, treedefs))
    kw = {"platforms": tuple(platforms)} if platforms else {}
    exp = jexport.export(fn, **kw)(variables, leaves, x)
    _write_artifact(path, exp.serialize(), variables, save_params, meta)


class SampledPredictor:
    """Serve a sampled (blocks-consuming) artifact: sample the requested
    nodes' neighborhoods on the serving graph with the EXPORT-time sampler
    configuration and run the exported forward per batch.

    The sampler config (fanouts, batch_size, device_features) comes from
    ``path + ".meta.json"`` (written by :func:`export_sampled_model`) unless
    overridden. All sampled batches share static shapes, so one artifact
    serves any node set."""

    def __init__(self, path: str, graph, variables=None, fanouts=None,
                 batch_size=None, seed: int = 0):
        import json

        self._exp = load_exported(path)
        self.graph = graph
        cfg = {}
        if os.path.exists(path + ".meta.json"):
            with open(path + ".meta.json") as f:
                cfg = json.load(f)
        self.fanouts = list(fanouts if fanouts is not None
                            else cfg.get("fanouts", (10, 10)))
        self.batch_size = int(batch_size if batch_size is not None
                              else cfg.get("batch_size", 256))
        self.device_features = bool(cfg.get("device_features", False))
        self.seed = seed
        if variables is None and os.path.exists(path + ".params"):
            from .trainer.checkpoint import load_checkpoint

            variables = jax.tree.map(
                jnp.asarray, load_checkpoint(path + ".params")["params"])
        self.variables = variables
        self._call = jax.jit(self._exp.call)

    def _sampler_for(self, nodes):
        # the sampler's CSR build is O(E) host work, invariant per graph —
        # construct once and retarget node_idx per request
        if getattr(self, "_sampler", None) is None:
            from .data.sampling import NeighborSampler

            self._sampler = NeighborSampler(
                self.graph, self.fanouts, batch_size=self.batch_size,
                seed=self.seed, node_idx=nodes,
                device_features=self.device_features)
        self._sampler.node_idx = nodes
        return self._sampler

    def predict_logits(self, nodes=None, variables=None):
        """Seed-node logits ``[len(nodes), C]`` (default: all real nodes)."""
        v = variables if variables is not None else self.variables
        if v is None:
            raise ValueError("no variables: pass them here or at init")
        if nodes is None:
            nodes = np.arange(self.graph.num_nodes)
        nodes = np.asarray(nodes)
        sampler = self._sampler_for(nodes)
        outs = []
        for blocks, _, _ in sampler.epoch(shuffle=False):
            blocks = list(blocks)
            if blocks[0].x is not None:
                x = blocks[0].x
                blocks[0] = _x_placeholder(blocks[0])
            else:
                x = jnp.take(blocks[0].extras["x_table"],
                             blocks[0].extras["frame"], axis=0, mode="clip")
            leaves = tuple(jax.tree.flatten(b)[0] for b in blocks)
            logits = self._call(v, leaves, x)
            outs.append(np.asarray(logits[: self.batch_size]))
        return np.concatenate(outs, 0)[: len(nodes)]  # drop tile padding

    def predict(self, nodes=None, variables=None):
        return np.argmax(self.predict_logits(nodes, variables), -1)
