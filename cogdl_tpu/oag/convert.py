"""OAGBert weight compatibility: torch-checkpoint → flax conversion and a
self-contained WordPiece tokenizer.

The reference downloads pretrained torch weights and loads them with
``load_state_dict`` (reference cogdl/oag/oagbert.py:46-78); this module maps
that exact state-dict naming (``bert.embeddings.*``,
``bert.encoder.layer.{i}.attention.self.query.*``,
``cls.predictions.transform.*`` — bert_model.py:170-428) onto the flax
backbone so real OAGBert checkpoints run unmodified the day the archive is
available: ``oagbert("saved/oagbert-v2")`` reads ``pytorch_model.bin`` +
``vocab.txt`` + ``bert_config.json`` just like the reference does.

Offline-testable: the parity test builds the reference torch model with
random init, converts, and asserts encoder outputs match (tests/test_oag.py).
"""

from __future__ import annotations

import json
import os
import re
import unicodedata
from typing import Dict, List, Optional

import numpy as np

__all__ = ["convert_torch_state_dict", "load_torch_checkpoint",
           "WordPieceTokenizer", "load_vocab"]


def _np(t):
    if hasattr(t, "detach"):
        t = t.detach().cpu().numpy()
    return np.asarray(t)


def convert_torch_state_dict(state_dict: Dict, num_layers: int,
                             dual_position: bool = False) -> Dict:
    """Reference torch state_dict → flax ``params`` tree for
    :class:`cogdl_tpu.oag.bert_model.BertModel`.

    Accepts tensors or numpy arrays; tolerates the ``bert.`` /
    ``cls.`` prefixes of ``BertForPreTrainingPreLN`` or a bare ``BertModel``
    dict. Linear kernels are transposed (torch stores [out, in])."""
    sd = {}
    for k, v in state_dict.items():
        sd[k[5:] if k.startswith("bert.") else k] = _np(v)

    def dense(prefix):
        return {"kernel": sd[prefix + ".weight"].T,
                "bias": sd[prefix + ".bias"]}

    def ln(prefix):
        return {"scale": sd[prefix + ".weight"],
                "bias": sd[prefix + ".bias"]}

    p: Dict = {
        "tok_emb": {"embedding": sd["embeddings.word_embeddings.weight"]},
        "pos_emb": {"embedding": sd["embeddings.position_embeddings.weight"]},
        "type_emb": {
            "embedding": sd["embeddings.token_type_embeddings.weight"]},
        "emb_ln": ln("embeddings.LayerNorm"),
        "final_ln": ln("encoder.FinalLayerNorm"),
        "pooler": dense("pooler.dense_act"),
    }
    # dual-position checkpoints ALSO carry position_embeddings_second, but
    # the reference forward never reads it (dual_position_bert_model.py:31
    # looks up position_embeddings for the second ids too) — skip it.
    for i in range(num_layers):
        L = f"encoder.layer.{i}"
        p[f"layer{i}"] = {
            "ln_pre": ln(f"{L}.PreAttentionLayerNorm"),
            "ln_post": ln(f"{L}.PostAttentionLayerNorm"),
            "attn": {
                "query": dense(f"{L}.attention.self.query"),
                "key": dense(f"{L}.attention.self.key"),
                "value": dense(f"{L}.attention.self.value"),
                "out": dense(f"{L}.attention.output.dense"),
            },
            "ff1": dense(f"{L}.intermediate.dense_act"),
            "ff2": dense(f"{L}.output.dense"),
        }
    if "cls.predictions.transform.dense_act.weight" in sd:
        p["mlm_transform"] = dense("cls.predictions.transform.dense_act")
        p["mlm_ln"] = ln("cls.predictions.transform.LayerNorm")
        # decoder weight is TIED to tok_emb in both implementations — only
        # the free bias transfers
        p["mlm_bias"] = sd["cls.predictions.bias"]
    else:
        D = p["tok_emb"]["embedding"].shape[1]
        V = p["tok_emb"]["embedding"].shape[0]
        p["mlm_transform"] = {"kernel": np.eye(D, dtype=np.float32),
                              "bias": np.zeros(D, np.float32)}
        p["mlm_ln"] = {"scale": np.ones(D, np.float32),
                       "bias": np.zeros(D, np.float32)}
        p["mlm_bias"] = np.zeros(V, np.float32)
    return p


def infer_config_from_state_dict(state_dict: Dict) -> Dict:
    """Architecture hyper-parameters recoverable from tensor names/shapes —
    used when a checkpoint directory carries ``pytorch_model.bin`` but no
    ``bert_config.json`` (the model must be built at the CHECKPOINT's layer
    count/width, or flax.apply silently drops the extra layers).
    ``num_heads`` is not shape-recoverable; BERT's universal head size of 64
    is assumed."""
    import warnings

    sd = {k[5:] if k.startswith("bert.") else k: v
          for k, v in state_dict.items()}
    vocab, hidden = sd["embeddings.word_embeddings.weight"].shape
    warnings.warn(
        "inferring OAGBert config from tensor shapes: num_heads is NOT "
        "recoverable from shapes and is assumed from BERT's universal head "
        "size of 64 (num_heads = hidden//64). A checkpoint trained with a "
        "different head count loads without error but computes different "
        "attention — supply bert_config.json to reproduce it exactly.",
        stacklevel=2)
    num_layers = 1 + max(
        int(m.group(1)) for k in sd
        if (m := re.search(r"encoder\.layer\.(\d+)\.", k)))
    return {
        "vocab_size": int(vocab),
        "hidden_size": int(hidden),
        "num_layers": int(num_layers),
        "num_heads": max(1, int(hidden) // 64),
        "intermediate_size": int(
            sd["encoder.layer.0.intermediate.dense_act.weight"].shape[0]),
        "max_position": int(
            sd["embeddings.position_embeddings.weight"].shape[0]),
        "type_vocab_size": int(
            sd["embeddings.token_type_embeddings.weight"].shape[0]),
    }


def load_torch_checkpoint(path: str, num_layers: Optional[int] = None,
                          dual_position: bool = False) -> Dict:
    """Load ``pytorch_model.bin`` (torch.save format) and convert. When the
    directory also holds ``bert_config.json`` the layer count comes from it
    (reference oagbert.py:62)."""
    import torch

    if os.path.isdir(path):
        cfg_path = os.path.join(path, "bert_config.json")
        if num_layers is None and os.path.exists(cfg_path):
            with open(cfg_path) as f:
                num_layers = json.load(f)["num_hidden_layers"]
        path = os.path.join(path, "pytorch_model.bin")
    sd = torch.load(path, map_location="cpu")
    if num_layers is None:
        num_layers = 1 + max(
            int(m.group(1)) for k in sd
            if (m := re.search(r"encoder\.layer\.(\d+)\.", k)))
    return convert_torch_state_dict(sd, num_layers, dual_position)


# ---------------------------------------------------------------------------
# WordPiece tokenizer (reference uses transformers.BertTokenizer,
# oagbert.py:64 — this is a dependency-free equivalent over vocab.txt)
# ---------------------------------------------------------------------------

def load_vocab(path: str) -> Dict[str, int]:
    vocab: Dict[str, int] = {}
    with open(path, encoding="utf-8") as f:
        for i, line in enumerate(f):
            tok = line.rstrip("\n")
            if tok:
                vocab[tok] = i
    return vocab


_PUNCT = re.compile(r"([\W_])", re.UNICODE)


class WordPieceTokenizer:
    """Greedy longest-match-first WordPiece over a BERT ``vocab.txt``
    (uncased basic tokenization: lowercase, strip accents, split
    punctuation)."""

    def __init__(self, vocab, lowercase: bool = True,
                 max_chars_per_word: int = 100):
        if isinstance(vocab, str):
            vocab = load_vocab(vocab)
        self.vocab = dict(vocab)
        self.ids_to_tokens = {i: t for t, i in self.vocab.items()}
        self.lowercase = lowercase
        self.max_chars = max_chars_per_word
        self.unk_token = "[UNK]"
        for name, tok in (("cls_token_id", "[CLS]"), ("sep_token_id", "[SEP]"),
                          ("mask_token_id", "[MASK]"), ("pad_token_id", "[PAD]"),
                          ("unk_token_id", "[UNK]")):
            setattr(self, name, self.vocab.get(tok, 0))

    # -- basic tokenization --------------------------------------------------
    def _basic(self, text: str) -> List[str]:
        if self.lowercase:
            text = text.lower()
            text = unicodedata.normalize("NFD", text)
            text = "".join(c for c in text
                           if unicodedata.category(c) != "Mn")
        out: List[str] = []
        for tok in text.split():
            out.extend(t for t in _PUNCT.split(tok) if t and not t.isspace())
        return out

    def _wordpiece(self, word: str) -> List[str]:
        if len(word) > self.max_chars:
            return [self.unk_token]
        pieces: List[str] = []
        start = 0
        while start < len(word):
            end = len(word)
            cur = None
            while start < end:
                sub = word[start:end]
                if start > 0:
                    sub = "##" + sub
                if sub in self.vocab:
                    cur = sub
                    break
                end -= 1
            if cur is None:
                return [self.unk_token]
            pieces.append(cur)
            start = end
        return pieces

    def tokenize(self, text: str) -> List[str]:
        out: List[str] = []
        for w in self._basic(text):
            out.extend(self._wordpiece(w))
        return out

    def convert_tokens_to_ids(self, tokens: List[str]) -> List[int]:
        unk = self.vocab.get(self.unk_token, 0)
        return [self.vocab.get(t, unk) for t in tokens]

    def convert_ids_to_tokens(self, ids) -> List[str]:
        return [self.ids_to_tokens.get(int(i), self.unk_token) for i in ids]

    def encode(self, text: str, add_special_tokens: bool = False) -> List[int]:
        ids = self.convert_tokens_to_ids(self.tokenize(text))
        if add_special_tokens:
            ids = [self.cls_token_id] + ids + [self.sep_token_id]
        return ids

    def __call__(self, text: str, **kw):
        return {"input_ids": self.encode(text, **kw)}
