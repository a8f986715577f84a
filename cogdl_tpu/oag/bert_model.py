"""BERT encoder in flax — the OAGBert backbone.

Rebuild of reference cogdl/oag/bert_model.py (573 LoC torch
``BertForPreTrainingPreLN``) as an idiomatic flax transformer. The reference
is a **pre-LN** BERT (GPT-2-style): each sublayer computes
``h + sublayer(LayerNorm(h))`` (PreAttentionLayerNorm /
PostAttentionLayerNorm, bert_model.py:306-327) with one FinalLayerNorm after
the stack (:328-334) — this module reproduces that computation exactly
(eps 1e-12, exact erf-GELU, additive −10000 attention mask) so converted
torch checkpoints (``convert.convert_torch_state_dict``) match outputs to
float tolerance. The dual-position variant (dual_position_bert_model.py)
adds a second position lookup THROUGH THE SAME TABLE
(dual_position_bert_model.py:31 reads ``position_embeddings``, not the
``position_embeddings_second`` it declares — reproduced faithfully).
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

LN_EPS = 1e-12


def _gelu(x):
    # reference LinearActivation uses torch F.gelu = exact erf form
    return jax.nn.gelu(x, approximate=False)


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
        # reference extended mask: (1 - mask) * -10000 added to the scores
        scores = scores + (1.0 - mask[:, None, None, :].astype(scores.dtype)
                           ) * -10000.0
        att = jax.nn.softmax(scores, axis=-1)
        if self.dropout > 0 and training:
            att = nn.Dropout(rate=self.dropout, deterministic=False)(att)
        ctx = jnp.einsum("bhlm,bmhd->blhd", att, v).reshape(B, L, D)
        out = nn.Dense(D, name="out")(ctx)
        if self.dropout > 0 and training:
            out = nn.Dropout(rate=self.dropout, deterministic=False)(out)
        return out


class BertLayer(nn.Module):
    """Pre-LN transformer block (reference BertLayer, bert_model.py:306):
    ``h1 = h + attn(ln_pre(h)); out = h1 + ff(ln_post(h1))``."""

    hidden_size: int
    num_heads: int
    intermediate_size: int
    dropout: float = 0.1

    @nn.compact
    def __call__(self, h, mask, training: bool = False):
        a = nn.LayerNorm(epsilon=LN_EPS, name="ln_pre")(h)
        a = BertSelfAttention(self.hidden_size, self.num_heads, self.dropout,
                              name="attn")(a, mask, training)
        h = h + a
        ff = nn.LayerNorm(epsilon=LN_EPS, name="ln_post")(h)
        ff = nn.Dense(self.intermediate_size, name="ff1")(ff)
        ff = _gelu(ff)
        ff = nn.Dense(self.hidden_size, name="ff2")(ff)
        if self.dropout > 0 and training:
            ff = nn.Dropout(rate=self.dropout, deterministic=False)(ff)
        return h + ff


class BertModel(nn.Module):
    """Encoder + pooler + MLM head — enough surface for OAGBert inference:
    encode, span probabilities, masked-token scoring. The MLM decoder is
    TIED to the token embedding (reference BertLMPredictionHead,
    bert_model.py:397-415: ``decoder.weight = word_embeddings.weight`` plus
    a free bias)."""

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
        tok = nn.Embed(self.vocab_size, self.hidden_size, name="tok_emb")
        pos = nn.Embed(self.max_position, self.hidden_size, name="pos_emb")
        emb = tok(input_ids) + pos(position_ids)
        if self.dual_position:
            # second position lookup through the SAME table — matching the
            # reference forward (dual_position_bert_model.py:31)
            pid2 = (position_ids if position_ids_second is None
                    else position_ids_second)
            emb += pos(pid2)
        emb += nn.Embed(self.type_vocab_size, self.hidden_size,
                        name="type_emb")(token_type_ids)
        h = nn.LayerNorm(epsilon=LN_EPS, name="emb_ln")(emb)
        if self.dropout > 0 and training:
            h = nn.Dropout(rate=self.dropout, deterministic=False)(h)
        for i in range(self.num_layers):
            h = BertLayer(self.hidden_size, self.num_heads,
                          self.intermediate_size, self.dropout,
                          name=f"layer{i}")(h, attention_mask, training)
        h = nn.LayerNorm(epsilon=LN_EPS, name="final_ln")(h)
        pooled = jnp.tanh(nn.Dense(self.hidden_size, name="pooler")(h[:, 0]))
        if not with_mlm:
            return h, pooled
        m = nn.Dense(self.hidden_size, name="mlm_transform")(h)
        m = _gelu(m)
        m = nn.LayerNorm(epsilon=LN_EPS, name="mlm_ln")(m)
        # tied decoder: logits = m @ tok_emb.T + bias
        mlm_bias = self.param("mlm_bias", nn.initializers.zeros,
                              (self.vocab_size,))
        mlm = m @ tok.embedding.T + mlm_bias
        return h, pooled, mlm
