"""BERT encoder in flax — the OAGBert backbone.

Rebuild of reference cogdl/oag/bert_model.py (573 LoC torch BERT) as an
idiomatic flax transformer: bf16-friendly, MXU-shaped (head_dim multiples of
64/128), jit-compiled end to end. The dual-position variant
(dual_position_bert_model.py) is a flag: a second position embedding table
added for span decoding.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp


class BertConfig:
    def __init__(self, vocab_size: int = 30522, hidden_size: int = 768,
                 num_layers: int = 12, num_heads: int = 12,
                 intermediate_size: int = 3072, max_position: int = 512,
                 type_vocab_size: int = 2, dropout: float = 0.1,
                 dual_position: bool = False):
        self.vocab_size = vocab_size
        self.hidden_size = hidden_size
        self.num_layers = num_layers
        self.num_heads = num_heads
        self.intermediate_size = intermediate_size
        self.max_position = max_position
        self.type_vocab_size = type_vocab_size
        self.dropout = dropout
        self.dual_position = dual_position


class BertSelfAttention(nn.Module):
    hidden_size: int
    num_heads: int
    dropout: float = 0.1

    @nn.compact
    def __call__(self, h, mask, training: bool = False):
        B, L, D = h.shape
        H = self.num_heads
        hd = D // H
        q = nn.Dense(D, name="query")(h).reshape(B, L, H, hd)
        k = nn.Dense(D, name="key")(h).reshape(B, L, H, hd)
        v = nn.Dense(D, name="value")(h).reshape(B, L, H, hd)
        scores = jnp.einsum("blhd,bmhd->bhlm", q, k) / jnp.sqrt(hd)
        big_neg = jnp.asarray(-1e30, scores.dtype)
        scores = jnp.where(mask[:, None, None, :], scores, big_neg)
        att = jax.nn.softmax(scores, axis=-1)
        if self.dropout > 0 and training:
            att = nn.Dropout(rate=self.dropout, deterministic=False)(att)
        ctx = jnp.einsum("bhlm,bmhd->blhd", att, v).reshape(B, L, D)
        out = nn.Dense(D, name="out")(ctx)
        if self.dropout > 0 and training:
            out = nn.Dropout(rate=self.dropout, deterministic=False)(out)
        return nn.LayerNorm(name="ln")(h + out)


class BertLayer(nn.Module):
    hidden_size: int
    num_heads: int
    intermediate_size: int
    dropout: float = 0.1

    @nn.compact
    def __call__(self, h, mask, training: bool = False):
        h = BertSelfAttention(self.hidden_size, self.num_heads, self.dropout,
                              name="attn")(h, mask, training)
        ff = nn.Dense(self.intermediate_size, name="ff1")(h)
        ff = jax.nn.gelu(ff)
        ff = nn.Dense(self.hidden_size, name="ff2")(ff)
        if self.dropout > 0 and training:
            ff = nn.Dropout(rate=self.dropout, deterministic=False)(ff)
        return nn.LayerNorm(name="ln")(h + ff)


class BertModel(nn.Module):
    """Encoder + pooler + MLM head (tied-free) — enough surface for OAGBert
    inference: encode, span probabilities, masked-token scoring."""

    vocab_size: int = 30522
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    max_position: int = 512
    type_vocab_size: int = 2
    dropout: float = 0.1
    dual_position: bool = False

    @nn.compact
    def __call__(self, input_ids, token_type_ids=None, attention_mask=None,
                 position_ids=None, position_ids_second=None,
                 training: bool = False, with_mlm: bool = False):
        B, L = input_ids.shape
        if attention_mask is None:
            attention_mask = jnp.ones((B, L), bool)
        if token_type_ids is None:
            token_type_ids = jnp.zeros((B, L), jnp.int32)
        if position_ids is None:
            position_ids = jnp.broadcast_to(jnp.arange(L), (B, L))
        emb = nn.Embed(self.vocab_size, self.hidden_size, name="tok_emb")(
            input_ids)
        emb += nn.Embed(self.max_position, self.hidden_size, name="pos_emb")(
            position_ids)
        if self.dual_position:
            # dual-position table for span decoding
            # (reference dual_position_bert_model.py)
            pid2 = (position_ids if position_ids_second is None
                    else position_ids_second)
            emb += nn.Embed(self.max_position, self.hidden_size,
                            name="pos_emb2")(pid2)
        emb += nn.Embed(self.type_vocab_size, self.hidden_size,
                        name="type_emb")(token_type_ids)
        h = nn.LayerNorm(name="emb_ln")(emb)
        if self.dropout > 0 and training:
            h = nn.Dropout(rate=self.dropout, deterministic=False)(h)
        for i in range(self.num_layers):
            h = BertLayer(self.hidden_size, self.num_heads,
                          self.intermediate_size, self.dropout,
                          name=f"layer{i}")(h, attention_mask, training)
        pooled = jnp.tanh(nn.Dense(self.hidden_size, name="pooler")(h[:, 0]))
        if not with_mlm:
            return h, pooled
        m = nn.Dense(self.hidden_size, name="mlm_transform")(h)
        m = jax.nn.gelu(m)
        m = nn.LayerNorm(name="mlm_ln")(m)
        mlm = nn.Dense(self.vocab_size, name="mlm_out")(m)
        return h, pooled, mlm
