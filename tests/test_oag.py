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
