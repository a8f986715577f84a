"""Layer forward shape checks (reference tests/test_layers.py pattern)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cogdl_tpu import layers as L
from cogdl_tpu.datasets.synthetic import sbm_graph


@pytest.fixture(scope="module")
def g():
    return sbm_graph(num_nodes=64, feat_dim=16, seed=0)


def _init_apply(layer, g, x, **kw):
    rng = jax.random.PRNGKey(0)
    variables = layer.init({"params": rng, "dropout": rng}, g, x, **kw)
    return layer.apply(variables, g, x, **kw)


def test_gcn_layer(g):
    out = _init_apply(L.GCNLayer(32), g, g.x)
    assert out.shape == (g.n_pad, 32)


def test_gat_layer_concat_and_mean(g):
    out = _init_apply(L.GATLayer(8, nhead=4, concat=True), g, g.x)
    assert out.shape == (g.n_pad, 32)
    out = _init_apply(L.GATLayer(8, nhead=4, concat=False), g, g.x)
    assert out.shape == (g.n_pad, 8)


@pytest.mark.parametrize("aggr", ["mean", "sum", "max", "gcn"])
def test_sage_layer_aggrs(g, aggr):
    out = _init_apply(L.SAGELayer(24, aggr=aggr), g, g.x)
    assert out.shape == (g.n_pad, 24)


def test_gin_layer(g):
    rng = jax.random.PRNGKey(0)
    layer = L.GINLayer(20)
    variables = layer.init({"params": rng}, g, g.x, training=False)
    out = layer.apply(variables, g, g.x, training=False,
                      mutable=["batch_stats"])[0]
    assert out.shape == (g.n_pad, 20)


def test_gcnii_layer(g):
    rng = jax.random.PRNGKey(0)
    layer = L.GCNIILayer(16)
    variables = layer.init({"params": rng}, g, g.x, g.x)
    out = layer.apply(variables, g, g.x, g.x)
    assert out.shape == (g.n_pad, 16)


def test_sgc_mixhop_appnp_se(g):
    assert _init_apply(L.SGCLayer(12), g, g.x).shape == (g.n_pad, 12)
    out = _init_apply(L.MixHopLayer(8, powers=(0, 1, 2)), g, g.x)
    assert out.shape == (g.n_pad, 24)
    assert _init_apply(L.APPNPProp(k=3), g, g.x).shape == g.x.shape
    rng = jax.random.PRNGKey(0)
    se = L.SELayer(4)
    v = se.init({"params": rng}, g.x)
    assert se.apply(v, g.x).shape == g.x.shape


def test_genconv_aggrs(g):
    for aggr in ("softmax", "softmax_sg", "powermean", "mean", "max"):
        out = _init_apply(L.GENConv(16, aggr=aggr), g, g.x)
        assert out.shape == (g.n_pad, 16)


def test_rgcn_layer(g):
    rng = np.random.default_rng(0)
    et = jnp.asarray(rng.integers(0, 3, g.e_pad).astype(np.int32))
    gr = g.replace(edge_type=et)
    out = _init_apply(L.RGCNLayer(16, num_relations=3), gr, g.x)
    assert out.shape == (g.n_pad, 16)


def test_mlp(g):
    rng = jax.random.PRNGKey(0)
    mlp = L.MLP(10, hidden_features=32, num_layers=3)
    v = mlp.init({"params": rng}, g.x)
    assert mlp.apply(v, g.x).shape == (g.n_pad, 10)


def test_gat_exact_scores_knob():
    """exact_scores switches the fused kernels to HIGHEST-precision matmuls
    (validated on-chip by scripts/validate_blocked_gat.py); the API path
    must train end-to-end either way."""
    import jax
    import numpy as np

    from cogdl_tpu.data.graph import add_self_loops
    from cogdl_tpu.datasets.synthetic import sbm_graph
    from cogdl_tpu.layers import GATLayer

    g = add_self_loops(sbm_graph(num_nodes=80, seed=2))
    for exact in (False, True):
        layer = GATLayer(4, nhead=2, attn_drop=0.0, exact_scores=exact)
        v = layer.init(jax.random.PRNGKey(0), g, g.x)
        out = layer.apply(v, g, g.x)
        assert np.isfinite(np.asarray(out)).all()
