"""OAGBert factory + entity-aware helpers.

Rebuild of reference cogdl/oag/oagbert.py (weight-download factory) and
oagbert_metainfo.py (entity-aware encoding, span probability, beam-search
decoding). Offline environment: ``oagbert()`` builds the architecture and
loads weights from a local checkpoint directory if given; the token/entity
span machinery works with any weights (including fresh ones for testing).
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .bert_model import BertModel

ENTITY_TYPES = ["TEXT", "AUTHOR", "VENUE", "AFF", "FOS"]


class OAGBertInference:
    """Entity-aware inference wrapper (reference OAGMetaInfoBertModel:
    calculate_span_prob / encode paper)."""

    def __init__(self, model: BertModel, variables, vocab: Optional[Dict[str, int]] = None):
        self.model = model
        self.variables = variables
        self.vocab = vocab or {}
        self._encode = jax.jit(
            lambda ids, types, mask: model.apply(
                variables, ids, types, mask, training=False))
        self._encode_mlm = jax.jit(
            lambda ids, types, mask: model.apply(
                variables, ids, types, mask, training=False, with_mlm=True))

    def encode(self, input_ids, token_type_ids=None, attention_mask=None):
        ids = jnp.asarray(input_ids)
        if ids.ndim == 1:
            ids = ids[None]
        B, L = ids.shape
        tt = (jnp.zeros((B, L), jnp.int32) if token_type_ids is None
              else jnp.asarray(token_type_ids).reshape(B, L))
        am = (jnp.ones((B, L), bool) if attention_mask is None
              else jnp.asarray(attention_mask).reshape(B, L))
        seq, pooled = self._encode(ids, tt, am)
        return np.asarray(seq), np.asarray(pooled)

    def calculate_span_prob(self, input_ids, span_start: int, span_end: int,
                            token_type_ids=None) -> float:
        """Mean masked-LM log-prob of the span tokens given the context
        (reference oagbert_metainfo.calculate_span_prob)."""
        ids = np.asarray(input_ids)
        masked = ids.copy()
        mask_token = self.vocab.get("[MASK]", 103)
        masked[span_start:span_end] = mask_token
        _, _, logits = self._encode_mlm(
            jnp.asarray(masked)[None],
            jnp.zeros((1, ids.shape[0]), jnp.int32)
            if token_type_ids is None else jnp.asarray(token_type_ids)[None],
            jnp.ones((1, ids.shape[0]), bool))
        logp = jax.nn.log_softmax(logits[0], axis=-1)
        tot = 0.0
        for pos in range(span_start, span_end):
            tot += float(logp[pos, ids[pos]])
        return tot / max(span_end - span_start, 1)

    def decode_beamsearch(self, prefix_ids: Sequence[int], max_len: int = 8,
                          beam: int = 4) -> List[Tuple[List[int], float]]:
        """Greedy-ish beam decoding of a masked suffix
        (reference oagbert_metainfo.decode_beamsearch)."""
        mask_token = self.vocab.get("[MASK]", 103)
        beams = [(list(prefix_ids), 0.0)]
        for _ in range(max_len):
            cand = []
            for ids, score in beams:
                arr = np.asarray(ids + [mask_token])
                _, _, logits = self._encode_mlm(
                    jnp.asarray(arr)[None],
                    jnp.zeros((1, arr.shape[0]), jnp.int32),
                    jnp.ones((1, arr.shape[0]), bool))
                logp = np.asarray(jax.nn.log_softmax(logits[0, -1]))
                top = np.argsort(-logp)[:beam]
                for t in top:
                    cand.append((ids + [int(t)], score + float(logp[t])))
            beams = sorted(cand, key=lambda kv: -kv[1])[:beam]
        return beams


def oagbert(name_or_path: Optional[str] = None, load_weights: bool = True,
            **config_overrides):
    """Factory (reference cogdl/oag/oagbert.py ``oagbert()``): returns
    (model, variables[, inference helper via .inference])."""
    small = {"hidden_size": 128, "num_layers": 2, "num_heads": 4,
             "intermediate_size": 256}
    cfg = dict(small if name_or_path is None
               or name_or_path.startswith("oagbert-test") else {})
    cfg.update(config_overrides)
    model = BertModel(dual_position="dual" in (name_or_path or ""), **cfg)
    rng = jax.random.PRNGKey(0)
    dummy = jnp.zeros((1, 8), jnp.int32)
    variables = model.init(rng, dummy, with_mlm=True)
    if (load_weights and name_or_path and os.path.isdir(name_or_path)):
        ckpt = os.path.join(name_or_path, "weights.ckpt")
        if os.path.exists(ckpt):
            from ..trainer.checkpoint import load_checkpoint

            variables = {"params": jax.tree.map(
                jnp.asarray, load_checkpoint(ckpt)["params"])}
    return model, variables


class OAGBertInferencePipeline:
    """pipeline("oagbert") — reference pipelines.py:123."""

    def __init__(self, app: str = "oagbert", model: str = "oagbert-test", **kw):
        m, variables = oagbert(model)
        self.infer = OAGBertInference(m, variables)

    def __call__(self, input_ids, **kw):
        return self.infer.encode(np.asarray(input_ids))
