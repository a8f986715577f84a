"""OAGBert: encode, span scoring, beam decode, pipeline (reference
tests/test_oag.py / test_encode_paper.py pattern, tiny config)."""

import numpy as np
import pytest

from cogdl_tpu.oag import oagbert
from cogdl_tpu.oag.oagbert import OAGBertInference


@pytest.fixture(scope="module")
def inf():
    m, v = oagbert("oagbert-test")
    return OAGBertInference(m, v)


def test_encode_shapes(inf):
    seq, pooled = inf.encode(np.array([101, 2023, 2003, 102]))
    assert seq.shape == (1, 4, 128)
    assert pooled.shape == (1, 128)


def test_encode_batch(inf):
    ids = np.array([[101, 2023, 102], [101, 2003, 102]])
    seq, pooled = inf.encode(ids)
    assert seq.shape == (2, 3, 128)


def test_span_prob_finite(inf):
    p = inf.calculate_span_prob(np.array([101, 2023, 2003, 1037, 102]), 2, 4)
    assert np.isfinite(p) and p <= 0.0


def test_beam_decode(inf):
    beams = inf.decode_beamsearch([101, 2023], max_len=2, beam=3)
    assert len(beams) == 3
    assert len(beams[0][0]) == 4
    assert beams[0][1] >= beams[-1][1]


def test_dual_position_variant():
    m, v = oagbert("oagbert-test-dual")
    assert m.dual_position
    import jax.numpy as jnp

    seq, pooled = m.apply(v, jnp.zeros((1, 5), jnp.int32))
    assert seq.shape[1] == 5


# ---------------------------------------------------------------------------
# torch-checkpoint compatibility (VERDICT r3 #6): reference BertForPre-
# TrainingPreLN with random weights -> convert -> outputs match to 1e-5
# ---------------------------------------------------------------------------

def _load_reference_bert():
    import importlib.util
    import sys
    import types

    torch = pytest.importorskip("torch")  # noqa: F841
    pkg = types.ModuleType("refoag")
    pkg.__path__ = []
    sys.modules.setdefault("refoag", pkg)
    out = []
    for name in ("bert_model", "dual_position_bert_model"):
        spec = importlib.util.spec_from_file_location(
            f"refoag.{name}", f"/root/reference/cogdl/oag/{name}.py")
        m = importlib.util.module_from_spec(spec)
        sys.modules[f"refoag.{name}"] = m
        spec.loader.exec_module(m)
        out.append(m)
    return out


@pytest.mark.parametrize("dual", [False, True])
def test_torch_state_dict_conversion_parity(dual):
    import torch

    ref_mod, ref_dual = _load_reference_bert()
    from cogdl_tpu.oag.bert_model import BertModel
    from cogdl_tpu.oag.convert import convert_torch_state_dict

    cfg = ref_mod.BertConfig.from_dict(dict(
        vocab_size=120, hidden_size=32,
        num_hidden_layers=2, num_attention_heads=4, intermediate_size=64,
        hidden_act="gelu", hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0, max_position_embeddings=40,
        type_vocab_size=5, initializer_range=0.02))
    torch.manual_seed(0)
    klass = (ref_dual.DualPositionBertForPreTrainingPreLN if dual
             else ref_mod.BertForPreTrainingPreLN)
    ref = klass(cfg).eval()

    params = convert_torch_state_dict(ref.state_dict(), num_layers=2,
                                      dual_position=dual)
    model = BertModel(vocab_size=120, hidden_size=32, num_layers=2,
                      num_heads=4, intermediate_size=64, max_position=40,
                      type_vocab_size=5, dropout=0.0, dual_position=dual)

    rng = np.random.default_rng(1)
    B, L = 2, 17
    ids = rng.integers(0, 120, (B, L))
    tts = rng.integers(0, 5, (B, L))
    mask = np.ones((B, L), np.int64)
    mask[0, -3:] = 0  # padding on one row exercises the additive mask
    pos1 = rng.integers(0, 6, (B, L))
    pos2 = rng.integers(0, 30, (B, L))

    with torch.no_grad():
        if dual:
            ref_seq, ref_pooled = ref.bert(
                torch.tensor(ids), torch.tensor(tts),
                attention_mask=torch.tensor(mask),
                position_ids=torch.tensor(pos1),
                position_ids_second=torch.tensor(pos2),
                output_all_encoded_layers=False,
                checkpoint_activations=False)
        else:
            ref_seq, ref_pooled = ref.bert(
                torch.tensor(ids), torch.tensor(tts),
                attention_mask=torch.tensor(mask),
                output_all_encoded_layers=False,
                checkpoint_activations=False)
        ref_mlm = ref.cls.predictions(ref_seq, None)

    import jax.numpy as jnp

    kw = {}
    if dual:
        kw = dict(position_ids=jnp.asarray(pos1),
                  position_ids_second=jnp.asarray(pos2))
    seq, pooled, mlm = model.apply(
        {"params": params}, jnp.asarray(ids), jnp.asarray(tts),
        jnp.asarray(mask, bool), training=False, with_mlm=True, **kw)

    # padded positions carry garbage in both impls only through the mask —
    # compare the REAL tokens
    real = np.asarray(mask, bool)
    np.testing.assert_allclose(np.asarray(seq)[real],
                               ref_seq.numpy()[real], atol=1e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(pooled), ref_pooled.numpy(),
                               atol=1e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(mlm)[real],
                               ref_mlm.numpy()[real], atol=1e-5, rtol=1e-4)


def test_oagbert_loads_torch_checkpoint_dir(tmp_path):
    """oagbert('dir') reads the reference archive layout: bert_config.json +
    pytorch_model.bin + vocab.txt + version."""
    import torch

    ref_mod, _ = _load_reference_bert()
    from cogdl_tpu.oag.oagbert import OAGBertInference, oagbert

    cfg = ref_mod.BertConfig.from_dict(dict(
        vocab_size=30, hidden_size=16,
        num_hidden_layers=1, num_attention_heads=2, intermediate_size=32,
        hidden_act="gelu", hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0, max_position_embeddings=20,
        type_vocab_size=2, initializer_range=0.02))
    torch.manual_seed(1)
    ref = ref_mod.BertForPreTrainingPreLN(cfg).eval()
    torch.save(ref.state_dict(), tmp_path / "pytorch_model.bin")
    import json

    (tmp_path / "bert_config.json").write_text(json.dumps({
        "vocab_size": 30, "hidden_size": 16, "num_hidden_layers": 1,
        "num_attention_heads": 2, "intermediate_size": 32,
        "max_position_embeddings": 20, "type_vocab_size": 2}))
    vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]", "the", "graph",
             "##s", "net", "##work", "neural", "deep", "a", ",", "."]
    vocab += [f"tok{i}" for i in range(30 - len(vocab))]
    (tmp_path / "vocab.txt").write_text("\n".join(vocab))

    model, variables = oagbert(str(tmp_path))
    inf = OAGBertInference(model, variables, tokenizer=model._tokenizer)
    seq, pooled = inf.encode(np.arange(8))
    assert seq.shape == (1, 8, 16) and np.isfinite(seq).all()

    ids = model._tokenizer.encode("the graphs network")
    assert ids == [5, 6, 7, 8, 9]  # greedy wordpiece over the toy vocab

    out = inf.build_inputs(title="deep graph networks", venue="the net",
                           authors=["a"], decode_span_type="FOS",
                           decode_span_length=2)
    (input_ids, masks, tts, mlm_labels, pos1, pos2, mpos, n_spans) = out
    assert n_spans == 4  # text + venue + author + mask span
    assert tts[-1] == 4 and input_ids[-1] == model._tokenizer.mask_token_id
    assert mpos == [len(input_ids) - 2, len(input_ids) - 1]
    # per-span positions: first ids constant per span, second ids restart
    assert pos1[0] == 0 and pos1[-1] == n_spans - 1 and pos2[-2:] == [0, 1]


def test_oagbert_infers_config_without_json(tmp_path):
    """A checkpoint dir with pytorch_model.bin but NO bert_config.json must
    build the model at the CHECKPOINT's architecture (review r4 — the
    default 12-layer build silently dropped the converted extra layers)."""
    import torch

    ref_mod, _ = _load_reference_bert()
    from cogdl_tpu.oag.oagbert import oagbert

    cfg = ref_mod.BertConfig.from_dict(dict(
        vocab_size=30, hidden_size=16,
        num_hidden_layers=3, num_attention_heads=2, intermediate_size=32,
        hidden_act="gelu", hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0, max_position_embeddings=20,
        type_vocab_size=2, initializer_range=0.02))
    torch.manual_seed(2)
    ref = ref_mod.BertForPreTrainingPreLN(cfg).eval()
    torch.save(ref.state_dict(), tmp_path / "pytorch_model.bin")

    model, variables = oagbert(str(tmp_path))
    assert model.num_layers == 3
    assert model.hidden_size == 16
    assert f"layer2" in variables["params"]
    seq = model.apply(variables, np.arange(6)[None].astype(np.int32))[0]
    assert seq.shape == (1, 6, 16) and np.isfinite(np.asarray(seq)).all()
