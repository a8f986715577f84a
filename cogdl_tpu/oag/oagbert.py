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

# reference-compat alias (oagbert_metainfo.py): same list, same index order
OAG_TOKEN_TYPE_NAMES = ENTITY_TYPES


class OAGBertInference:
    """Entity-aware inference wrapper (reference OAGMetaInfoBertModel:
    calculate_span_prob / encode paper / build_inputs)."""

    def __init__(self, model: BertModel, variables,
                 vocab: Optional[Dict[str, int]] = None, tokenizer=None):
        self.model = model
        self.variables = variables
        self.tokenizer = tokenizer
        self.vocab = vocab or (dict(tokenizer.vocab) if tokenizer else {})
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

    def build_inputs(self, title="", abstract="", venue="", authors=(),
                     concepts=(), affiliations=(), decode_span_type="FOS",
                     decode_span_length: int = 0, max_seq_length: int = 512,
                     mask_propmt_text=""):
        """Entity-aware input construction from raw text — the reference's
        8-tuple contract (oagbert_metainfo.py:195-259 ``build_inputs``):
        one span per entity, per-span first positions, within-span second
        positions, and a trailing [MASK] span of ``decode_span_length``
        tokens of type ``decode_span_type``. Requires a tokenizer
        (``oagbert(dir_with_vocab_txt)`` attaches one)."""
        if self.tokenizer is None:
            raise ValueError(
                "build_inputs needs a tokenizer — load the model from a "
                "checkpoint directory containing vocab.txt")
        tk = self.tokenizer
        input_ids: list = []
        input_masks: list = []
        token_type_ids: list = []
        masked_lm_labels: list = []
        position_ids: list = []
        position_ids_second: list = []
        masked_positions: list = []
        num_spans = 0

        def add_span(token_type_id, token_ids, is_mask=False):
            nonlocal num_spans
            if len(token_ids) == 0:
                return
            length = len(token_ids)
            input_ids.extend(token_ids if not is_mask
                             else [tk.mask_token_id] * length)
            input_masks.extend([1] * length)
            token_type_ids.extend([token_type_id] * length)
            masked_lm_labels.extend([-1] * length if not is_mask
                                    else [tk.cls_token_id] * length)
            position_ids.extend([num_spans] * length)
            position_ids_second.extend(list(range(length)))
            if is_mask:
                masked_positions.extend(
                    [len(input_ids) - length + i
                     for i in range(decode_span_length)])
            num_spans += 1

        if decode_span_type not in OAG_TOKEN_TYPE_NAMES:
            raise ValueError(f"unexpected span type: {decode_span_type}")
        span_tt = OAG_TOKEN_TYPE_NAMES.index(decode_span_type)
        prompt_ids = tk.encode(mask_propmt_text)
        add_span(0, (tk.encode(title) + tk.encode(abstract) + prompt_ids)[
            : max_seq_length - decode_span_length])
        add_span(2, tk.encode(venue)[
            : max_seq_length - len(input_ids) - decode_span_length])
        for author in authors:
            add_span(1, tk.encode(author)[
                : max_seq_length - len(input_ids) - decode_span_length])
        for concept in concepts:
            add_span(4, tk.encode(concept)[
                : max_seq_length - len(input_ids) - decode_span_length])
        for affiliation in affiliations:
            add_span(3, tk.encode(affiliation)[
                : max_seq_length - len(input_ids) - decode_span_length])
        add_span(span_tt, [0] * decode_span_length, is_mask=True)
        return (input_ids, input_masks, token_type_ids, masked_lm_labels,
                position_ids, position_ids_second, masked_positions,
                num_spans)

    def encode_paper(self, reduction: str = "first", **kw):
        """Forward the built inputs through the dual-position encoder and
        pool per entity span (reference encode_paper, reduction='first'|
        'mean'|'max' over each span's sequence outputs)."""
        (ids, masks, tts, _, pos1, pos2, _, n_spans) = self.build_inputs(**kw)
        ids_a = jnp.asarray(ids)[None]
        seq, pooled = self.model.apply(
            self.variables, ids_a, jnp.asarray(tts)[None],
            jnp.asarray(masks, bool)[None],
            position_ids=jnp.asarray(pos1)[None],
            position_ids_second=jnp.asarray(pos2)[None], training=False)
        seq = np.asarray(seq[0])
        spans = {}
        pos1 = np.asarray(pos1)
        for s in range(n_spans):
            rows = seq[pos1 == s]
            if reduction == "mean":
                spans[s] = rows.mean(0)
            elif reduction == "max":
                spans[s] = rows.max(0)
            else:
                spans[s] = rows[0]
        return spans, np.asarray(pooled[0])

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
    (model, variables). A checkpoint DIRECTORY is read the way the
    reference reads its downloaded archives (oagbert.py:46-78):
    ``bert_config.json`` (architecture), ``pytorch_model.bin`` (torch
    state_dict → converted via ``convert.convert_torch_state_dict``),
    ``vocab.txt`` (WordPiece tokenizer, attached to ``model._tokenizer``),
    ``version`` == "2" → dual-position entity-aware variant. The repo's own
    ``weights.ckpt`` flax format keeps working."""
    small = {"hidden_size": 128, "num_layers": 2, "num_heads": 4,
             "intermediate_size": 256}
    cfg = dict(small if name_or_path is None
               or name_or_path.startswith("oagbert-test") else {})
    dual = "dual" in (name_or_path or "")
    tokenizer = None
    torch_sd_dir = None
    if name_or_path and os.path.isdir(name_or_path):
        bc = os.path.join(name_or_path, "bert_config.json")
        if os.path.exists(bc):
            import json

            with open(bc) as f:
                ref = json.load(f)
            cfg = {
                "vocab_size": ref.get("vocab_size", 30522),
                "hidden_size": ref.get("hidden_size", 768),
                "num_layers": ref.get("num_hidden_layers", 12),
                "num_heads": ref.get("num_attention_heads", 12),
                "intermediate_size": ref.get("intermediate_size", 3072),
                "max_position": ref.get("max_position_embeddings", 512),
                "type_vocab_size": ref.get("type_vocab_size", 2),
            }
        vpath = os.path.join(name_or_path, "version")
        if os.path.exists(vpath):
            with open(vpath) as f:
                dual = dual or f.readline().strip() == "2"
        vocab_path = os.path.join(name_or_path, "vocab.txt")
        if os.path.exists(vocab_path):
            from .convert import WordPieceTokenizer

            tokenizer = WordPieceTokenizer(vocab_path)
        if os.path.exists(os.path.join(name_or_path, "pytorch_model.bin")):
            torch_sd_dir = name_or_path
            if "num_layers" not in cfg:
                # no bert_config.json: size the model from the checkpoint's
                # own tensor shapes, or flax.apply would silently run the
                # default 12 layers against a deeper converted tree
                import torch

                from .convert import infer_config_from_state_dict

                cfg = infer_config_from_state_dict(torch.load(
                    os.path.join(name_or_path, "pytorch_model.bin"),
                    map_location="cpu"))
    cfg.update(config_overrides)
    model = BertModel(dual_position=dual, **cfg)
    rng = jax.random.PRNGKey(0)
    dummy = jnp.zeros((1, 8), jnp.int32)
    variables = model.init(rng, dummy, with_mlm=True)
    if load_weights and torch_sd_dir is not None:
        from .convert import load_torch_checkpoint

        params = jax.tree.map(jnp.asarray, load_torch_checkpoint(
            torch_sd_dir, num_layers=cfg.get("num_layers"),
            dual_position=dual))
        variables = {"params": params}
    elif (load_weights and name_or_path and os.path.isdir(name_or_path)):
        ckpt = os.path.join(name_or_path, "weights.ckpt")
        if os.path.exists(ckpt):
            from ..trainer.checkpoint import load_checkpoint

            variables = {"params": jax.tree.map(
                jnp.asarray, load_checkpoint(ckpt)["params"])}
    # linen modules are frozen dataclasses; the tokenizer is side-channel
    # metadata, not a pytree field
    object.__setattr__(model, "_tokenizer", tokenizer)
    return model, variables


class OAGBertInferencePipeline:
    """pipeline("oagbert") — reference pipelines.py:123."""

    def __init__(self, app: str = "oagbert", model: str = "oagbert-test", **kw):
        m, variables = oagbert(model)
        self.infer = OAGBertInference(m, variables)

    def __call__(self, input_ids, **kw):
        return self.infer.encode(np.asarray(input_ids))
