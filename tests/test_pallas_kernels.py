"""Pallas kernel parity vs the XLA fallback tier (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cogdl_tpu import ops
from cogdl_tpu.data.graph import add_self_loops, sym_norm
from cogdl_tpu.datasets.synthetic import sbm_graph
from cogdl_tpu.ops.pallas import prepare_spmm
from cogdl_tpu.ops.pallas.segment_kernels import (
    build_spmm_layout,
    sorted_segment_matmul,
    spmm_pallas,
)


@pytest.fixture(scope="module")
def prepped():
    g = sym_norm(add_self_loops(sbm_graph(num_nodes=300, seed=3)))
    g = prepare_spmm(g)
    x = jnp.asarray(
        np.random.default_rng(0).normal(size=(g.n_pad, 32)).astype(np.float32))
    return g, x


def _pallas_args(g):
    ex = g.extras
    return (ex["spmm_fw_col"], ex["spmm_fw_w"], ex["spmm_fw_row"],
            ex["spmm_fw_ct"], ex["spmm_bw_col"], ex["spmm_bw_w"],
            ex["spmm_bw_row"], ex["spmm_bw_ct"])


def test_layout_construction(prepped):
    g, _ = prepped
    ex = g.extras
    E_k = ex["spmm_fw_col"].shape[0]
    assert E_k % 1024 == 0
    assert ex["spmm_fw_ct"].shape[0] == E_k // 1024
    # pad entries carry zero weight; real weights preserved in total
    np.testing.assert_allclose(float(ex["spmm_fw_w"].sum()),
                               float(g.edge_weight.sum()), rtol=1e-5)
    np.testing.assert_allclose(float(ex["spmm_bw_w"].sum()),
                               float(g.edge_weight.sum()), rtol=1e-5)
    # chunk→tile map is monotonic (required for output revisiting)
    ct = np.asarray(ex["spmm_fw_ct"])
    assert np.all(np.diff(ct) >= 0)


def test_forward_parity(prepped):
    g, x = prepped
    ref = ops.spmm_coo(x, g.row, g.col, g.edge_weight, g.n_pad)
    out = spmm_pallas(x, *_pallas_args(g))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)


def test_backward_parity(prepped):
    g, x = prepped
    args = _pallas_args(g)

    def loss_p(x):
        return jnp.sum(spmm_pallas(x, *args) ** 2)

    def loss_r(x):
        return jnp.sum(ops.spmm_coo(x, g.row, g.col, g.edge_weight, g.n_pad) ** 2)

    gp = np.asarray(jax.grad(loss_p)(x))
    gr = np.asarray(jax.grad(loss_r)(x))
    scale = np.maximum(np.abs(gr), 1.0)
    np.testing.assert_allclose(gp / scale, gr / scale, rtol=1e-4, atol=1e-4)


def test_odd_feature_width(prepped):
    g, _ = prepped
    x = jnp.asarray(np.random.default_rng(1).normal(
        size=(g.n_pad, 47)).astype(np.float32))
    ref = ops.spmm_coo(x, g.row, g.col, g.edge_weight, g.n_pad)
    out = spmm_pallas(x, *_pallas_args(g))
    assert out.shape == (g.n_pad, 47)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)


def test_spmm_dispatch_uses_layout_only_on_tpu(prepped):
    g, x = prepped
    # on CPU the dispatcher must fall back (kernel runs only via explicit call)
    from cogdl_tpu.ops.pallas import maybe_pallas_spmm

    assert maybe_pallas_spmm(g, x) is None
    out = ops.spmm(g, x)
    ref = ops.spmm_coo(x, g.row, g.col, g.edge_weight, g.n_pad)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5)


def test_device_layout_matches_host(prepped):
    """Jittable layout builder == host builder, judged by SpMM output."""
    from cogdl_tpu.ops.pallas.device_layout import build_spmm_layout_jax

    g, x = prepped
    E = g.num_edges
    lay = jax.jit(build_spmm_layout_jax, static_argnames="n_pad")(
        g.row[:E], g.col[:E], g.edge_weight[:E], n_pad=g.n_pad)
    ct = np.asarray(lay["chunk_tile"])
    assert np.all(np.diff(ct) >= 0)
    ref = ops.spmm_coo(x, g.row, g.col, g.edge_weight, g.n_pad)
    out = sorted_segment_matmul(
        jnp.pad(jnp.take(x, lay["col_k"], axis=0), ((0, 0), (0, 96))),
        lay["row_k"], lay["w_k"], lay["chunk_tile"], g.n_pad)[:, :32]
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)


def test_prepare_spmm_device_symmetric(prepped):
    from cogdl_tpu.ops.pallas.device_layout import prepare_spmm_device

    g, x = prepped
    g2 = g.replace(extras=None)
    gd = prepare_spmm_device(g2, symmetric=True)
    assert gd.extras["spmm_bw_col"] is gd.extras["spmm_fw_col"]
    out = spmm_pallas(x, *_pallas_args(gd))
    ref = ops.spmm_coo(x, g.row, g.col, g.edge_weight, g.n_pad)
    # sbm graph is undirected + sym-normalised → Aᵀ = A, fwd parity holds
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)
    # backward through the shared layout == backward through the XLA tier
    gp = jax.grad(lambda v: jnp.sum(spmm_pallas(v, *_pallas_args(gd)) ** 2))(x)
    gr = jax.grad(lambda v: jnp.sum(
        ops.spmm_coo(v, g.row, g.col, g.edge_weight, g.n_pad) ** 2))(x)
    np.testing.assert_allclose(np.asarray(gp), np.asarray(gr),
                               rtol=1e-4, atol=1e-4)


def test_blocked_driver_matches_unblocked(prepped):
    """Mega-block streaming (scan + dynamic-slab accumulate) == one-shot."""
    from cogdl_tpu.ops.pallas.segment_kernels import _blocked_gather_spmm

    g, x = prepped
    ex = g.extras
    n_chunks = ex["spmm_fw_ct"].shape[0]
    block = 2
    padc = (-n_chunks) % block
    pad_slots = padc * 1024
    n_tiles = g.n_pad // 128
    col_k = jnp.pad(ex["spmm_fw_col"], (0, pad_slots))
    w_k = jnp.pad(ex["spmm_fw_w"], (0, pad_slots))
    row_k = jnp.pad(ex["spmm_fw_row"], (0, pad_slots),
                    constant_values=(n_tiles - 1) * 128)
    ct = jnp.pad(ex["spmm_fw_ct"], (0, padc), constant_values=n_tiles - 1)
    xp = jnp.pad(x, ((0, 0), (0, 96)))
    out = _blocked_gather_spmm(xp, col_k, w_k, row_k, ct, g.n_pad,
                               block_chunks=block)[:, :32]
    ref = ops.spmm_coo(x, g.row, g.col, g.edge_weight, g.n_pad)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)


def test_panel_layout_blocked_matches(prepped):
    """Source-panel layout + panel-slice blocked driver == XLA reference.

    Uses tiny mega-blocks (block_chunks=2) so the CPU interpret path stays
    fast; panels of 128 rows force several panels and empty (panel, tile)
    groups — exercising the visited-tile masking and per-panel alignment."""
    from cogdl_tpu.ops.pallas.device_layout import (
        build_spmm_layout_jax,
        count_layout_chunks,
    )
    from cogdl_tpu.ops.pallas.segment_kernels import _blocked_gather_spmm

    g, x = prepped
    E = g.num_edges
    panel_rows, block = 128, 2
    nc = count_layout_chunks(g.row[:E], g.col[:E], g.n_pad, panel_rows,
                             block_chunks=block)
    lay = build_spmm_layout_jax(g.row[:E], g.col[:E], g.edge_weight[:E],
                                n_pad=g.n_pad, panel_rows=panel_rows,
                                exact_chunks=nc, block_chunks=block)
    # blocked layouts are emitted pre-reshaped to [n_blocks, ...]
    assert lay["chunk_tile"].shape == (nc // block, block)
    assert lay["block_panel"].shape[0] == nc // block
    assert int(lay["col_k"].max()) < panel_rows
    # per-block monotone tiles
    ct = np.asarray(lay["chunk_tile"])
    assert all(np.all(np.diff(r) >= 0) for r in ct)

    xp = jnp.pad(x, ((0, 0), (0, 96)))
    out = _blocked_gather_spmm(
        xp, lay["col_k"], lay["w_k"], lay["row_k"], lay["chunk_tile"],
        g.n_pad, block_panel=lay["block_panel"], panel_rows=panel_rows,
        block_chunks=block)[:, :32]
    ref = ops.spmm_coo(x, g.row, g.col, g.edge_weight, g.n_pad)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)


def test_panel_layout_r_tile_256(prepped):
    """r_tile=256 layouts (coarser dst tiles, less quantisation padding)
    still aggregate correctly through the blocked driver."""
    from cogdl_tpu.ops.pallas.device_layout import (
        build_spmm_layout_jax,
        count_layout_chunks,
    )
    from cogdl_tpu.ops.pallas.segment_kernels import _blocked_gather_spmm

    from cogdl_tpu.data.graph import pad_to

    g, x = prepped
    g = pad_to(g, 512, g.e_pad)
    x = jnp.pad(x, ((0, g.n_pad - x.shape[0]), (0, 0)))
    E = g.num_edges
    panel_rows, block, rt = 256, 2, 256
    nc = count_layout_chunks(g.row[:E], g.col[:E], g.n_pad, panel_rows,
                             block_chunks=block, r_tile=rt)
    lay = build_spmm_layout_jax(g.row[:E], g.col[:E], g.edge_weight[:E],
                                n_pad=g.n_pad, panel_rows=panel_rows,
                                exact_chunks=nc, block_chunks=block,
                                r_tile=rt)
    xp = jnp.pad(x, ((0, 0), (0, 96)))
    out = _blocked_gather_spmm(
        xp, lay["col_k"], lay["w_k"], lay["row_k"], lay["chunk_tile"],
        g.n_pad, block_panel=lay["block_panel"], panel_rows=panel_rows,
        block_chunks=block, r_tile=rt)[:, :32]
    ref = ops.spmm_coo(x, g.row, g.col, g.edge_weight, g.n_pad)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)


def test_panel_layout_with_empty_groups():
    """A panel whose edges skip destination tiles (empty (panel, tile)
    groups) must still aggregate correctly through the blocked driver —
    regression test for the block-local tile-span bug: without a ≥1-chunk
    guarantee per group, a mega-block's rebased tile ids could exceed its
    local output buffer (silently zeroed rows)."""
    from cogdl_tpu.ops.pallas.device_layout import (
        build_spmm_layout_jax,
        count_layout_chunks,
    )
    from cogdl_tpu.ops.pallas.segment_kernels import _blocked_gather_spmm

    n_pad, panel_rows, block = 1024, 256, 2
    rng = np.random.default_rng(11)
    # edges land ONLY in dst tiles 0 and 6 (tiles 1-5, 7 empty) with sources
    # spread over all 4 panels → most (panel, tile) groups are empty
    dst = np.concatenate([rng.integers(0, 128, 600),
                          rng.integers(768, 896, 600)]).astype(np.int32)
    src = rng.integers(0, n_pad, 1200).astype(np.int32)
    w = rng.uniform(0.5, 1.5, 1200).astype(np.float32)
    nc = count_layout_chunks(jnp.asarray(dst), jnp.asarray(src), n_pad,
                             panel_rows, block_chunks=block)
    lay = build_spmm_layout_jax(jnp.asarray(dst), jnp.asarray(src),
                                jnp.asarray(w), n_pad=n_pad,
                                panel_rows=panel_rows, exact_chunks=nc,
                                block_chunks=block)
    x = jnp.asarray(rng.normal(size=(n_pad, 128)).astype(np.float32))
    out = _blocked_gather_spmm(
        x, lay["col_k"], lay["w_k"], lay["row_k"], lay["chunk_tile"],
        n_pad, block_panel=lay["block_panel"], panel_rows=panel_rows,
        block_chunks=block)
    ref = ops.spmm_coo(x, jnp.asarray(dst), jnp.asarray(src),
                       jnp.asarray(w), n_pad)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)


def test_prepare_spmm_device_panels_roundtrip(prepped):
    """prepare_spmm_device with explicit panel_rows emits panel extras and
    meta; the weights survive (sum parity)."""
    from cogdl_tpu.ops.pallas.device_layout import prepare_spmm_device

    g, _ = prepped
    gd = prepare_spmm_device(g.replace(extras=None), symmetric=True,
                             panel_rows=128)
    assert gd.meta_get("spmm_panel_rows") == 128
    assert "spmm_fw_bp" in gd.extras
    np.testing.assert_allclose(float(gd.extras["spmm_fw_w"].sum()),
                               float(g.edge_weight.sum()), rtol=1e-5)


def test_powerlaw_device_graph_trains():
    """Device-resident generator + device layouts run a GCN step end-to-end."""
    import optax

    from cogdl_tpu.datasets.synthetic import powerlaw_graph_device
    from cogdl_tpu.models import build_model
    from cogdl_tpu.utils.evaluator import masked_cross_entropy

    g = powerlaw_graph_device(1000, avg_degree=8, feat_dim=16, num_classes=5)
    assert g.meta_get("symmetric")
    # structure sanity: row sorted, row_ptr consistent, weights sym-normalised
    row = np.asarray(g.row)
    assert np.all(np.diff(row) >= 0)
    rp = np.asarray(g.row_ptr)
    assert rp[-1] == g.num_edges
    deg = np.diff(rp)
    assert deg[: g.num_nodes].min() >= 1  # self loops guarantee degree ≥ 1
    ref = ops.spmm_coo(g.x, g.row, g.col, g.edge_weight, g.n_pad)
    assert np.isfinite(np.asarray(ref)).all()

    model = build_model("gcn", in_features=16, out_features=5,
                        hidden_size=16, dropout=0.0)
    params = model.init(jax.random.PRNGKey(0), g, g.x,
                        training=False)["params"]
    tx = optax.adam(1e-2)
    opt = tx.init(params)

    @jax.jit
    def step(p, o):
        def loss_fn(p):
            logits = model.apply({"params": p}, g, g.x, training=False)
            return masked_cross_entropy(logits, g.y,
                                        g.train_mask & g.node_mask())
        loss, grads = jax.value_and_grad(loss_fn)(p)
        upd, o2 = tx.update(grads, o, p)
        return optax.apply_updates(p, upd), o2, loss

    p, o, l0 = step(params, opt)
    for _ in range(5):
        p, o, l = step(p, o)
    assert float(l) < float(l0)


class TestGatFused:
    H, D = 4, 8

    @pytest.fixture(scope="class")
    def setup(self):
        g = sym_norm(add_self_loops(sbm_graph(num_nodes=200, seed=5)))
        g = prepare_spmm(g)
        rng = np.random.default_rng(7)
        n = g.n_pad
        sd = jnp.asarray(rng.normal(size=(n, self.H)).astype(np.float32))
        h = jnp.asarray(
            rng.normal(size=(n, self.H, self.D)).astype(np.float32))
        # the fused path recomputes the src score half from h via a_src —
        # ss is DERIVED, not free (see gat_fused_p docstring)
        a_src = jnp.asarray(
            rng.normal(size=(self.H, self.D)).astype(np.float32))
        ss = jnp.einsum("nhd,hd->nh", h, a_src)
        return g, sd, ss, h, a_src

    @staticmethod
    def _ref(g, sd, ss, h, alpha=0.2):
        """XLA-tier reference: gather scores, stable edge softmax, mh-spmm."""
        from cogdl_tpu import ops

        e = jnp.take(sd, g.row, axis=0) + jnp.take(ss, g.col, axis=0)
        e = jax.nn.leaky_relu(e, alpha)
        att = ops.edge_softmax(g, e)
        return ops.mh_spmm(g, att, h)

    def _fused(self, g, sd, ss, h, a_src, attn_drop=0.0, seed=0):
        from cogdl_tpu.ops.pallas.segment_kernels import build_ar, gat_fused

        ex = g.extras
        ar = build_ar(a_src, self.H, self.D)
        out = gat_fused(
            self.H, self.D, 0.2, attn_drop, sd, ss,
            h.reshape(-1, self.H * self.D), ar, jnp.uint32(seed),
            ex["spmm_fw_col"], ex["spmm_fw_row"], ex["spmm_fw_ones"],
            ex["spmm_fw_ct"], ex["spmm_fw_orig"],
            ex["spmm_bw_col"], ex["spmm_bw_row"], ex["spmm_bw_ones"],
            ex["spmm_bw_ct"], ex["spmm_bw_orig"])
        return out.reshape(-1, self.H, self.D)

    def test_forward_parity(self, setup):
        g, sd, ss, h, a_src = setup
        ref = self._ref(g, sd, ss, h)
        out = self._fused(g, sd, ss, h, a_src)
        np.testing.assert_allclose(np.asarray(out)[: g.num_nodes],
                                   np.asarray(ref)[: g.num_nodes],
                                   rtol=1e-4, atol=1e-5)

    def test_grad_parity(self, setup):
        g, sd, ss, h, a_src = setup
        w = jnp.asarray(np.random.default_rng(9).normal(
            size=(g.n_pad, self.H, self.D)).astype(np.float32))
        mask = g.node_mask()[:, None, None]

        def loss_fused(sd, ss, h):
            return jnp.sum(jnp.where(
                mask, self._fused(g, sd, ss, h, a_src) * w, 0.0))

        def loss_ref(sd, ss, h):
            return jnp.sum(jnp.where(mask, self._ref(g, sd, ss, h) * w, 0.0))

        gf = jax.grad(loss_fused, argnums=(0, 1, 2))(sd, ss, h)
        gr = jax.grad(loss_ref, argnums=(0, 1, 2))(sd, ss, h)
        for a, b, name in zip(gf, gr, ("dsd", "dss", "dh")):
            a, b = np.asarray(a)[: g.num_nodes], np.asarray(b)[: g.num_nodes]
            np.testing.assert_allclose(a, b, rtol=2e-3, atol=2e-4,
                                       err_msg=name)

    @pytest.mark.parametrize("layout", ["wide", "split"])
    def test_alternate_layouts_grads_identical(self, setup, monkeypatch,
                                               layout):
        """Every single-shot gather-table layout (bench --gat-layout)
        computes identical grads to the default."""
        from cogdl_tpu.ops.pallas import segment_kernels as sk

        g, sd, ss, h, a_src = setup

        def loss(sd, ss, h):
            return jnp.sum(self._fused(g, sd, ss, h, a_src) ** 2)

        g0 = jax.grad(loss, argnums=(0, 1, 2))(sd, ss, h)
        monkeypatch.setattr(sk, "GAT_SINGLE_LAYOUT", layout)
        g1 = jax.grad(loss, argnums=(0, 1, 2))(sd, ss, h)
        for a, b, name in zip(g1, g0, ("dsd", "dss", "dh")):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-5, atol=1e-6, err_msg=name)

    def test_stream_cache_grads_identical(self, setup, monkeypatch):
        """The cached-stream backward (dsd pass reusing the forward's
        gathered stream) computes the SAME grads as the re-gathering
        default — identical inputs reach the identical kernel."""
        from cogdl_tpu.ops.pallas import segment_kernels as sk

        g, sd, ss, h, a_src = setup

        def loss(sd, ss, h):
            return jnp.sum(self._fused(g, sd, ss, h, a_src) ** 2)

        g0 = jax.grad(loss, argnums=(0, 1, 2))(sd, ss, h)
        monkeypatch.setattr(sk, "GAT_STREAM_CACHE_BYTES", 4 << 30)
        g1 = jax.grad(loss, argnums=(0, 1, 2))(sd, ss, h)
        for a, b, name in zip(g0, g1, ("dsd", "dss", "dh")):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-6, atol=1e-7, err_msg=name)

    def test_dropout_statistics_and_determinism(self, setup):
        g, sd, ss, h, a_src = setup
        o1 = self._fused(g, sd, ss, h, a_src, attn_drop=0.5, seed=123)
        o2 = self._fused(g, sd, ss, h, a_src, attn_drop=0.5, seed=123)
        o3 = self._fused(g, sd, ss, h, a_src, attn_drop=0.5, seed=321)
        np.testing.assert_array_equal(np.asarray(o1), np.asarray(o2))
        assert np.abs(np.asarray(o1) - np.asarray(o3)).max() > 1e-6
        # dropped aggregation stays unbiased in expectation: compare means
        ref = self._ref(g, sd, ss, h)
        m_ref = float(jnp.mean(jnp.abs(ref[: g.num_nodes])))
        m_drop = float(jnp.mean(jnp.abs(o1[: g.num_nodes])))
        assert 0.5 * m_ref < m_drop < 2.0 * m_ref

    def test_dropout_grads_finite(self, setup):
        g, sd, ss, h, a_src = setup

        def loss(sd, ss, h):
            return jnp.sum(self._fused(g, sd, ss, h, a_src, attn_drop=0.3,
                                       seed=11) ** 2)

        grads = jax.grad(loss, argnums=(0, 1, 2))(sd, ss, h)
        for a in grads:
            assert np.isfinite(np.asarray(a)).all()


def test_segment_matmul_direct():
    # tiny hand-checkable case through the raw kernel
    n_pad = 128
    E_k = 1024
    row_k = np.zeros(E_k, np.int32)
    row_k[:3] = [0, 0, 5]
    w_k = np.zeros(E_k, np.float32)
    w_k[:3] = [1.0, 0.5, 2.0]
    msg = np.zeros((E_k, 128), np.float32)
    msg[0] = 1.0
    msg[1] = 2.0
    msg[2] = 7.0
    out = sorted_segment_matmul(
        jnp.asarray(msg), jnp.asarray(row_k), jnp.asarray(w_k),
        jnp.asarray([0], np.int32), n_pad)
    out = np.asarray(out)
    np.testing.assert_allclose(out[0], 2.0)   # 1*1 + 0.5*2
    np.testing.assert_allclose(out[5], 14.0)  # 2*7
    np.testing.assert_allclose(out[1], 0.0)


class TestGatFusedBlocked:
    """Blocked + source-panel fused GAT — the ogbn-products-scale path:
    mega-block streamed passes, panel-local gathers, ONE packed int32 slot
    stream (col | row offset | validity) shared by both directions with
    per-direction orig maps (stored only when dropout is requested)."""

    H, D = 4, 8

    @pytest.fixture(scope="class")
    def setup(self):
        from cogdl_tpu.data.graph import pad_to
        from cogdl_tpu.ops.pallas.device_layout import prepare_spmm_device

        g = add_self_loops(sbm_graph(num_nodes=250, seed=11))
        n_pad = ((g.n_pad + 127) // 128) * 128
        g = pad_to(g, n_pad, g.e_pad)
        g = prepare_spmm_device(g, symmetric=True, with_orig=True,
                                with_dropout=True,
                                panel_rows=128, block_chunks=2)
        ex = g.extras
        assert "spmm_fw_w" not in ex          # store_w defaults off here
        assert "spmm_fw_ones" not in ex       # validity rides the pack bit
        assert "spmm_fw_col" not in ex        # packed stream replaces col/row
        assert ex["spmm_fw_pack"].ndim == 2   # blocked layout
        assert ex["spmm_bw_pack"] is ex["spmm_fw_pack"]   # shared buffer
        # dropout masks are hashed from slot coordinates in-kernel — no
        # orig maps exist on packed layouts
        assert "spmm_fw_orig" not in ex and "spmm_bw_orig" not in ex
        rng = np.random.default_rng(13)
        h = jnp.asarray(
            rng.normal(size=(g.n_pad, self.H, self.D)).astype(np.float32))
        a_src = jnp.asarray(
            rng.normal(size=(self.H, self.D)).astype(np.float32))
        # blocked layouts recompute BOTH score halves from h in-kernel —
        # sd is as derived as ss here (the layer-level contract)
        a_dst = jnp.asarray(
            rng.normal(size=(self.H, self.D)).astype(np.float32))
        return g, a_dst, a_src, h

    @staticmethod
    def _ref(g, sd, ss, h, alpha=0.2):
        from cogdl_tpu import ops

        e = jnp.take(sd, g.row, axis=0) + jnp.take(ss, g.col, axis=0)
        e = jax.nn.leaky_relu(e, alpha)
        att = ops.edge_softmax(g, e)
        return ops.mh_spmm(g, att, h)

    def _fused(self, g, a_dst, a_src, h, attn_drop=0.0, seed=0):
        from cogdl_tpu.ops.pallas.segment_kernels import (
            build_ar,
            gat_fused_p,
        )

        ex = g.extras
        zb = jnp.zeros(0, jnp.int32)
        zf = jnp.zeros(0, jnp.float32)
        sd = jnp.einsum("nhd,hd->nh", h, a_dst)
        ss = jnp.einsum("nhd,hd->nh", h, a_src)
        ar = build_ar(a_src, self.H, self.D)
        al = build_ar(a_dst, self.H, self.D)
        out = gat_fused_p(
            self.H, self.D, 0.2, attn_drop,
            int(g.meta_get("spmm_panel_rows")),
            int(g.meta_get("spmm_panel_rows_bw",
                           g.meta_get("spmm_panel_rows"))),
            int(g.meta_get("spmm_r_tile")), False,
            sd, ss, h.reshape(-1, self.H * self.D), ar, al, jnp.uint32(seed),
            ex["spmm_fw_pack"], zb, zf,
            ex["spmm_fw_ct"], zb, ex["spmm_fw_bp"],
            ex["spmm_bw_pack"], zb, zf,
            ex["spmm_bw_ct"], zb, ex["spmm_bw_bp"])
        return out.reshape(-1, self.H, self.D)

    def _ref_av(self, g, a_dst, a_src, h):
        sd = jnp.einsum("nhd,hd->nh", h, a_dst)
        ss = jnp.einsum("nhd,hd->nh", h, a_src)
        return self._ref(g, sd, ss, h)

    def test_forward_parity(self, setup):
        g, a_dst, a_src, h = setup
        ref = self._ref_av(g, a_dst, a_src, h)
        out = self._fused(g, a_dst, a_src, h)
        np.testing.assert_allclose(np.asarray(out)[: g.num_nodes],
                                   np.asarray(ref)[: g.num_nodes],
                                   rtol=1e-4, atol=1e-5)

    def test_grad_parity(self, setup):
        g, a_dst, a_src, h = setup
        w = jnp.asarray(np.random.default_rng(3).normal(
            size=(g.n_pad, self.H, self.D)).astype(np.float32))
        mask = g.node_mask()[:, None, None]

        def loss_fused(a_dst, a_src, h):
            return jnp.sum(jnp.where(
                mask, self._fused(g, a_dst, a_src, h) * w, 0.0))

        def loss_ref(a_dst, a_src, h):
            return jnp.sum(jnp.where(
                mask, self._ref_av(g, a_dst, a_src, h) * w, 0.0))

        gf = jax.grad(loss_fused, argnums=(0, 1, 2))(a_dst, a_src, h)
        gr = jax.grad(loss_ref, argnums=(0, 1, 2))(a_dst, a_src, h)
        for a, b, name in zip(gf, gr, ("da_dst", "da_src", "dh")):
            a, b = np.asarray(a), np.asarray(b)
            np.testing.assert_allclose(a, b, rtol=2e-3, atol=2e-3,
                                       err_msg=name)

    def test_dropout_determinism(self, setup):
        g, a_dst, a_src, h = setup
        o1 = self._fused(g, a_dst, a_src, h, attn_drop=0.5, seed=99)
        o2 = self._fused(g, a_dst, a_src, h, attn_drop=0.5, seed=99)
        o3 = self._fused(g, a_dst, a_src, h, attn_drop=0.5, seed=100)
        np.testing.assert_array_equal(np.asarray(o1), np.asarray(o2))
        assert np.abs(np.asarray(o1) - np.asarray(o3)).max() > 1e-6

    def test_dropout_grads_finite(self, setup):
        g, a_dst, a_src, h = setup

        def loss(a_dst, a_src, h):
            return jnp.sum(self._fused(g, a_dst, a_src, h, attn_drop=0.3,
                                       seed=4) ** 2)

        grads = jax.grad(loss, argnums=(0, 1, 2))(a_dst, a_src, h)
        for a in grads:
            assert np.isfinite(np.asarray(a)).all()

    def test_dropout_vjp_matches_finite_differences(self, setup):
        """At a FIXED seed the fused op is a deterministic function, so its
        hand-derived VJP must match central differences — this catches any
        disagreement between the forward's and the two backward passes'
        coordinate-hashed dropout masks (each pass regenerates the mask
        independently, in a different slot order)."""
        g, a_dst, a_src, h = setup
        rng = np.random.default_rng(17)
        w = jnp.asarray(rng.normal(
            size=(g.n_pad, self.H, self.D)).astype(np.float32))

        def loss(h):
            return jnp.sum(self._fused(g, a_dst, a_src, h, attn_drop=0.4,
                                       seed=77) * w)

        grad = jax.grad(loss)(h)
        for k in range(3):
            v = jnp.asarray(rng.normal(size=h.shape).astype(np.float32))
            eps = 1e-3
            fd = (float(loss(h + eps * v)) - float(loss(h - eps * v))) / (
                2 * eps)
            an = float(jnp.vdot(grad, v))
            assert abs(fd - an) <= 2e-2 * max(abs(fd), abs(an), 1.0), (
                k, fd, an)


def test_symmetric_transposed_layout_identical():
    """The symmetric-sharing contract: for a symmetric edge set, a build of
    the transposed edges yields slot-for-slot identical col/row/w/ct (the
    3-key deterministic sort), differing only in the orig map."""
    from cogdl_tpu.data.graph import pad_to
    from cogdl_tpu.ops.pallas.device_layout import (
        build_spmm_layout_jax,
        count_layout_chunks,
    )

    g = add_self_loops(sbm_graph(num_nodes=250, seed=21))
    g = pad_to(g, ((g.n_pad + 127) // 128) * 128, g.e_pad)
    E = g.num_edges
    row, col, w = g.row[:E], g.col[:E], g.edge_weight[:E]
    nc = count_layout_chunks(row, col, g.n_pad, 128, block_chunks=2)
    kw = dict(n_pad=g.n_pad, with_orig=True, panel_rows=128,
              exact_chunks=nc, block_chunks=2)
    fw = build_spmm_layout_jax(row, col, w, **kw)
    bw = build_spmm_layout_jax(col, row, w, **kw)
    for k in ("col_k", "row_k", "w_k", "chunk_tile", "block_panel",
              "pack_k"):
        np.testing.assert_array_equal(np.asarray(fw[k]), np.asarray(bw[k]),
                                      err_msg=k)
    # orig maps pair the SAME (row, col) slot with the transposed edge
    fo, bo = np.asarray(fw["orig_k"]).ravel(), np.asarray(bw["orig_k"]).ravel()
    rowv = np.asarray(row)
    colv = np.asarray(col)
    valid = fo >= 0
    np.testing.assert_array_equal(valid, bo >= 0)
    # fw slot s holds edge (row=dst, col=src); bw's orig at s names the
    # original edge whose (row, col) TRANSPOSED matches the slot
    rk = np.asarray(fw["row_k"]).ravel()[valid]
    np.testing.assert_array_equal(rowv[fo[valid]], rk)
    np.testing.assert_array_equal(colv[bo[valid]], rk)


class TestAccumRouteAB:
    """Both streamed-accumulation routes must agree: the default in-kernel
    aliased accumulation (SPMM_BLOCK_ACCUM=True — output tiles read-modify-
    written at absolute offsets) and the legacy local-slab route (per-block
    slab + visited mask + dynamic_update_slice). The flag flips trace-time
    Python branches, so each test runs the SAME inputs down both routes."""

    def _spmm_blocked(self, g, x):
        from cogdl_tpu.ops.pallas.segment_kernels import _blocked_gather_spmm

        ex = g.extras
        n_chunks = ex["spmm_fw_ct"].shape[0]
        block = 2
        padc = (-n_chunks) % block
        pad_slots = padc * 1024
        n_tiles = g.n_pad // 128
        col_k = jnp.pad(ex["spmm_fw_col"], (0, pad_slots))
        w_k = jnp.pad(ex["spmm_fw_w"], (0, pad_slots))
        row_k = jnp.pad(ex["spmm_fw_row"], (0, pad_slots),
                        constant_values=(n_tiles - 1) * 128)
        ct = jnp.pad(ex["spmm_fw_ct"], (0, padc),
                     constant_values=n_tiles - 1)
        xp = jnp.pad(x, ((0, 0), (0, 96)))
        return _blocked_gather_spmm(xp, col_k, w_k, row_k, ct, g.n_pad,
                                    block_chunks=block)[:, :32]

    def test_spmm_routes_agree(self, prepped, monkeypatch):
        from cogdl_tpu.ops.pallas import segment_kernels as sk

        g, x = prepped
        monkeypatch.setattr(sk, "SPMM_BLOCK_ACCUM", True)
        out_accum = np.asarray(self._spmm_blocked(g, x))
        monkeypatch.setattr(sk, "SPMM_BLOCK_ACCUM", False)
        out_slab = np.asarray(self._spmm_blocked(g, x))
        ref = np.asarray(ops.spmm_coo(x, g.row, g.col, g.edge_weight,
                                      g.n_pad))
        np.testing.assert_allclose(out_accum, ref, rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(out_slab, ref, rtol=1e-4, atol=1e-5)

    def test_gat_blocked_routes_agree(self, monkeypatch):
        from cogdl_tpu.data.graph import pad_to
        from cogdl_tpu.ops.pallas import segment_kernels as sk
        from cogdl_tpu.ops.pallas.device_layout import prepare_spmm_device

        t = TestGatFusedBlocked()
        g = add_self_loops(sbm_graph(num_nodes=250, seed=11))
        g = pad_to(g, ((g.n_pad + 127) // 128) * 128, g.e_pad)
        # a route A/B on ONE layout needs a layout valid for BOTH routes —
        # drop_empty_groups layouts are accum-only
        g = prepare_spmm_device(g, symmetric=True, with_orig=True,
                                panel_rows=128, block_chunks=2,
                                drop_empty_groups=False)
        rng = np.random.default_rng(13)
        h = jnp.asarray(rng.normal(size=(g.n_pad, t.H, t.D)).astype(
            np.float32))
        a_src = jnp.asarray(rng.normal(size=(t.H, t.D)).astype(np.float32))
        a_dst = jnp.asarray(rng.normal(size=(t.H, t.D)).astype(np.float32))
        w = jnp.asarray(rng.normal(size=(g.n_pad, t.H, t.D)).astype(
            np.float32))

        def loss(a_dst, a_src, h):
            return jnp.sum(t._fused(g, a_dst, a_src, h) * w)

        outs = {}
        for flag in (True, False):
            monkeypatch.setattr(sk, "SPMM_BLOCK_ACCUM", flag)
            fwd = np.asarray(t._fused(g, a_dst, a_src, h))
            grads = jax.grad(loss, argnums=(0, 1, 2))(a_dst, a_src, h)
            outs[flag] = (fwd, *(np.asarray(a) for a in grads))
        for a, b, name in zip(outs[True], outs[False],
                              ("fwd", "da_dst", "da_src", "dh")):
            np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-5,
                                       err_msg=name)


def test_gat_blocked_r_tile_512():
    """r_tile=512 packed layouts (10-bit in-tile row offset, validity at
    bit 28 — the widened r5 slot format) run the fused GAT passes
    correctly."""
    from cogdl_tpu.data.graph import pad_to
    from cogdl_tpu.ops.pallas.device_layout import prepare_spmm_device

    t = TestGatFusedBlocked()
    g = add_self_loops(sbm_graph(num_nodes=600, seed=5))
    g = pad_to(g, ((g.n_pad + 511) // 512) * 512, g.e_pad)
    g = prepare_spmm_device(g, symmetric=True, with_orig=True,
                            panel_rows=512, block_chunks=2, r_tile=512)
    assert int(g.meta_get("spmm_r_tile")) == 512
    rng = np.random.default_rng(7)
    h = jnp.asarray(rng.normal(size=(g.n_pad, t.H, t.D)).astype(np.float32))
    a_src = jnp.asarray(rng.normal(size=(t.H, t.D)).astype(np.float32))
    a_dst = jnp.asarray(rng.normal(size=(t.H, t.D)).astype(np.float32))
    ref = t._ref_av(g, a_dst, a_src, h)
    out = t._fused(g, a_dst, a_src, h)
    np.testing.assert_allclose(np.asarray(out)[: g.num_nodes],
                               np.asarray(ref)[: g.num_nodes],
                               rtol=1e-4, atol=1e-5)
    # gradients flow through the widened format too
    w = jnp.asarray(rng.normal(size=(g.n_pad, t.H, t.D)).astype(np.float32))
    gf = jax.grad(lambda hh: jnp.sum(t._fused(g, a_dst, a_src, hh) * w))(h)
    gr = jax.grad(lambda hh: jnp.sum(t._ref_av(g, a_dst, a_src, hh) * w))(h)
    np.testing.assert_allclose(np.asarray(gf), np.asarray(gr),
                               rtol=2e-3, atol=2e-3)


def test_prepare_spmm_r_tile_256_single_shot():
    """Single-shot layouts at r_tile=256 (taller dst tiles, less 1024-slot
    quantisation): plain SpMM and the fused GAT path both match the XLA
    tier, mirroring the maybe_* dispatch (spmm_pallas_p / gat_fused_p with
    panel_rows=0, r_tile from graph meta)."""
    from cogdl_tpu.ops.pallas.segment_kernels import (
        build_ar,
        gat_fused_p,
        spmm_pallas_p,
    )

    g = sym_norm(add_self_loops(sbm_graph(num_nodes=300, seed=3)))
    g = prepare_spmm(g, r_tile=256)
    assert int(g.meta_get("spmm_r_tile")) == 256
    assert g.n_pad % 256 == 0
    ex = g.extras
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(g.n_pad, 32)).astype(np.float32))
    zb = jnp.zeros(0, jnp.int32)

    def pallas(v):
        return spmm_pallas_p(0, False, 256, v,
                             ex["spmm_fw_col"], ex["spmm_fw_w"],
                             ex["spmm_fw_row"], ex["spmm_fw_ct"], zb,
                             ex["spmm_bw_col"], ex["spmm_bw_w"],
                             ex["spmm_bw_row"], ex["spmm_bw_ct"], zb)

    ref = ops.spmm_coo(x, g.row, g.col, g.edge_weight, g.n_pad)
    np.testing.assert_allclose(np.asarray(pallas(x)), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)
    gp = jax.grad(lambda v: jnp.sum(pallas(v) ** 2))(x)
    gr = jax.grad(lambda v: jnp.sum(
        ops.spmm_coo(v, g.row, g.col, g.edge_weight, g.n_pad) ** 2))(x)
    np.testing.assert_allclose(np.asarray(gp), np.asarray(gr),
                               rtol=1e-4, atol=1e-4)

    # fused GAT at r_tile=256 (single-shot, unpacked layout)
    H, D = 4, 8
    t = TestGatFused()
    h = jnp.asarray(rng.normal(size=(g.n_pad, H, D)).astype(np.float32))
    a_src = jnp.asarray(rng.normal(size=(H, D)).astype(np.float32))
    sd = jnp.asarray(rng.normal(size=(g.n_pad, H)).astype(np.float32))
    ss = jnp.einsum("nhd,hd->nh", h, a_src)
    ar = build_ar(a_src, H, D)

    def fused(sd, ss, h):
        out = gat_fused_p(
            H, D, 0.2, 0.0, 0, 0, 256, False,
            sd, ss, h.reshape(-1, H * D), ar, jnp.zeros_like(ar),
            jnp.uint32(0),
            ex["spmm_fw_col"], ex["spmm_fw_row"], ex["spmm_fw_ones"],
            ex["spmm_fw_ct"], ex["spmm_fw_orig"], zb,
            ex["spmm_bw_col"], ex["spmm_bw_row"], ex["spmm_bw_ones"],
            ex["spmm_bw_ct"], ex["spmm_bw_orig"], zb)
        return out.reshape(-1, H, D)

    ref_gat = t._ref(g, sd, ss, h)
    np.testing.assert_allclose(np.asarray(fused(sd, ss, h))[: g.num_nodes],
                               np.asarray(ref_gat)[: g.num_nodes],
                               rtol=1e-4, atol=1e-5)
    w = jnp.asarray(rng.normal(size=(g.n_pad, H, D)).astype(np.float32))
    mask = g.node_mask()[:, None, None]
    gf = jax.grad(lambda hh: jnp.sum(jnp.where(
        mask, fused(sd, jnp.einsum("nhd,hd->nh", hh, a_src), hh) * w,
        0.0)))(h)
    gr2 = jax.grad(lambda hh: jnp.sum(jnp.where(
        mask, t._ref(g, sd, jnp.einsum("nhd,hd->nh", hh, a_src), hh) * w,
        0.0)))(h)
    np.testing.assert_allclose(np.asarray(gf)[: g.num_nodes],
                               np.asarray(gr2)[: g.num_nodes],
                               rtol=2e-3, atol=2e-3)


def test_gat_blocked_r_tile_1024_and_empty_groups():
    """r5 layout changes: 10-bit in-tile row offset (r_tile ≤ 1024, validity
    at bit 28) and drop_empty_groups (no pad chunk per empty (panel, tile)
    group — valid on the aliased-accumulation drivers). The graph
    concentrates edges in the low tiles so high (panel, tile) groups are
    GUARANTEED empty."""
    from cogdl_tpu.data.graph import from_coo, pad_to
    from cogdl_tpu.ops.pallas.device_layout import (
        count_layout_chunks, prepare_spmm_device)

    t = TestGatFusedBlocked()
    rng = np.random.default_rng(11)
    n = 700
    r0 = rng.integers(0, n, 2500)
    c0 = rng.integers(0, n, 2500)
    # SYMMETRIZE (symmetric=True shares the fw layout with the backward —
    # a directed edge set would silently run the backward on the wrong
    # layout) + self loops + dedupe
    row = np.concatenate([r0, c0, np.arange(n)])
    col = np.concatenate([c0, r0, np.arange(n)])
    _, idx = np.unique(row * n + col, return_index=True)
    g = from_coo(np.stack([row[idx], col[idx]]), num_nodes=n)
    g = pad_to(g, ((g.n_pad + 1023) // 1024) * 1024 * 2, g.e_pad)  # 2 tiles
    E = g.num_edges
    nc_drop = count_layout_chunks(g.row[:E], g.col[:E], g.n_pad,
                                  panel_rows=1024, block_chunks=2,
                                  r_tile=1024, drop_empty_groups=True)
    nc_keep = count_layout_chunks(g.row[:E], g.col[:E], g.n_pad,
                                  panel_rows=1024, block_chunks=2,
                                  r_tile=1024, drop_empty_groups=False)
    assert nc_drop < nc_keep   # the empties' pad chunks are gone
    g = prepare_spmm_device(g, symmetric=True, with_orig=True,
                            panel_rows=1024, block_chunks=2, r_tile=1024,
                            drop_empty_groups=True)
    rng = np.random.default_rng(7)
    h = jnp.asarray(rng.normal(size=(g.n_pad, t.H, t.D)).astype(np.float32))
    a_src = jnp.asarray(rng.normal(size=(t.H, t.D)).astype(np.float32))
    a_dst = jnp.asarray(rng.normal(size=(t.H, t.D)).astype(np.float32))
    ref = t._ref_av(g, a_dst, a_src, h)
    out = t._fused(g, a_dst, a_src, h)
    np.testing.assert_allclose(np.asarray(out)[: g.num_nodes],
                               np.asarray(ref)[: g.num_nodes],
                               rtol=1e-4, atol=1e-5)
    w = jnp.asarray(rng.normal(size=(g.n_pad, t.H, t.D)).astype(np.float32))
    gf = jax.grad(lambda hh: jnp.sum(t._fused(g, a_dst, a_src, hh) * w))(h)
    gr = jax.grad(lambda hh: jnp.sum(t._ref_av(g, a_dst, a_src, hh) * w))(h)
    np.testing.assert_allclose(np.asarray(gf), np.asarray(gr),
                               rtol=2e-3, atol=2e-3)


def test_spmm_blocked_empty_groups_accum():
    """Plain blocked SpMM on a drop_empty_groups layout matches XLA — rows
    whose (panel, tile) group is empty stay exactly zero (the accum driver
    zero-inits the global buffer and never visits them)."""
    from cogdl_tpu.data.graph import from_coo, pad_to, sym_norm
    import importlib

    spmm_mod = importlib.import_module('cogdl_tpu.ops.spmm')
    from cogdl_tpu.ops.pallas.device_layout import prepare_spmm_device

    rng = np.random.default_rng(13)
    n = 500
    r0 = rng.integers(0, n, 1500)
    c0 = rng.integers(0, n, 1500)
    row = np.concatenate([r0, c0, np.arange(n)])
    col = np.concatenate([c0, r0, np.arange(n)])
    _, idx = np.unique(row * n + col, return_index=True)
    g0 = from_coo(np.stack([row[idx], col[idx]]), num_nodes=n)
    g0 = sym_norm(g0)
    g0 = pad_to(g0, ((g0.n_pad + 511) // 512) * 512 * 2, g0.e_pad)
    g = prepare_spmm_device(g0, symmetric=True, panel_rows=512,
                            block_chunks=2, r_tile=512,
                            drop_empty_groups=True)
    x = jnp.asarray(rng.normal(size=(g.n_pad, 128)).astype(np.float32))
    ref = spmm_mod.spmm_coo(x, g0.row, g0.col, g0.edge_weight, g.n_pad)
    out = spmm_mod.spmm(g, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_gat_blocked_per_direction_panels():
    """Per-direction panel sizing (r5): the fw (dst-grouped) layout at 2x
    the bw layout's panel height — fwd/dsd sweep the wide-panel layout,
    dsrc the narrow one — matches the XLA reference in forward AND
    gradients."""
    from cogdl_tpu.data.graph import pad_to
    from cogdl_tpu.ops.pallas.device_layout import prepare_spmm_device

    t = TestGatFusedBlocked()
    g = add_self_loops(sbm_graph(num_nodes=600, seed=5))
    g = pad_to(g, ((g.n_pad + 511) // 512) * 512, g.e_pad)
    g = prepare_spmm_device(g, symmetric=True, with_orig=True,
                            panel_rows=1024, panel_rows_bw=512,
                            block_chunks=2, r_tile=512)
    assert int(g.meta_get("spmm_panel_rows")) == 1024
    assert int(g.meta_get("spmm_panel_rows_bw")) == 512
    rng = np.random.default_rng(7)
    h = jnp.asarray(rng.normal(size=(g.n_pad, t.H, t.D)).astype(np.float32))
    a_src = jnp.asarray(rng.normal(size=(t.H, t.D)).astype(np.float32))
    a_dst = jnp.asarray(rng.normal(size=(t.H, t.D)).astype(np.float32))
    ref = t._ref_av(g, a_dst, a_src, h)
    out = t._fused(g, a_dst, a_src, h)
    np.testing.assert_allclose(np.asarray(out)[: g.num_nodes],
                               np.asarray(ref)[: g.num_nodes],
                               rtol=1e-4, atol=1e-5)
    w = jnp.asarray(rng.normal(size=(g.n_pad, t.H, t.D)).astype(np.float32))
    gf = jax.grad(lambda hh: jnp.sum(t._fused(g, a_dst, a_src, hh) * w))(h)
    gr = jax.grad(lambda hh: jnp.sum(t._ref_av(g, a_dst, a_src, hh) * w))(h)
    np.testing.assert_allclose(np.asarray(gf), np.asarray(gr),
                               rtol=2e-3, atol=2e-3)
    # with attention dropout: fwd/bwd consistency (coordinate-hashed masks
    # are panel-base-aware, so per-direction panels must still agree)
    out_d = t._fused(g, a_dst, a_src, h, attn_drop=0.35, seed=7)
    assert out_d.shape == out.shape


def test_gat_blocked_wide_bw2_layout():
    """Narrow-backward-table layers (HD + 2H ≤ 128) may run their dsrc
    pass on the WIDE-panel src-grouped layout (spmm_bw2_*): for symmetric
    edge sets it ALIASES the fw build (3-key-sort determinism), and the
    passes produce identical results through it."""
    from cogdl_tpu.data.graph import pad_to
    from cogdl_tpu.ops.pallas.device_layout import prepare_spmm_device

    t = TestGatFusedBlocked()
    g = add_self_loops(sbm_graph(num_nodes=600, seed=5))
    g = pad_to(g, ((g.n_pad + 511) // 512) * 512, g.e_pad)
    g = prepare_spmm_device(g, symmetric=True, with_orig=True,
                            panel_rows=1024, panel_rows_bw=512,
                            block_chunks=2, r_tile=512)
    ex = g.extras
    assert "spmm_bw2_pack" in ex
    assert ex["spmm_bw2_pack"] is ex["spmm_fw_pack"]   # symmetric aliasing
    rng = np.random.default_rng(7)
    h = jnp.asarray(rng.normal(size=(g.n_pad, t.H, t.D)).astype(np.float32))
    a_src = jnp.asarray(rng.normal(size=(t.H, t.D)).astype(np.float32))
    a_dst = jnp.asarray(rng.normal(size=(t.H, t.D)).astype(np.float32))

    # run the passes the way maybe_gat_fused selects for a narrow layer:
    # bw := bw2 (wide panels, same panel size as fw)
    from cogdl_tpu.ops.pallas.segment_kernels import build_ar, gat_fused_p

    zb = jnp.zeros(0, jnp.int32)
    zf = jnp.zeros(0, jnp.float32)
    ar = build_ar(a_src, t.H, t.D)
    al = build_ar(a_dst, t.H, t.D)

    def fused_bw2(hh):
        # BOTH score halves derive from hh (the layer-level contract: the
        # blocked kernels recompute them from h2, but the grads route
        # through the sd/ss cotangents)
        h3 = hh.reshape(-1, t.H, t.D)
        out = gat_fused_p(
            t.H, t.D, 0.2, 0.0, 1024, 1024, 512, False,
            jnp.einsum("nhd,hd->nh", h3, a_dst),
            jnp.einsum("nhd,hd->nh", h3, a_src),
            hh, ar, al, jnp.uint32(0),
            ex["spmm_fw_pack"], zb, zf, ex["spmm_fw_ct"], zb,
            ex["spmm_fw_bp"],
            ex["spmm_bw2_pack"], zb, zf, ex["spmm_bw2_ct"], zb,
            ex["spmm_bw2_bp"])
        return out

    h2 = h.reshape(-1, t.H * t.D)
    ref = t._ref_av(g, a_dst, a_src, h).reshape(-1, t.H * t.D)
    out = fused_bw2(h2)
    np.testing.assert_allclose(np.asarray(out)[: g.num_nodes],
                               np.asarray(ref)[: g.num_nodes],
                               rtol=1e-4, atol=1e-5)
    w = jnp.asarray(rng.normal(size=h2.shape).astype(np.float32))
    gf = jax.grad(lambda hh: jnp.sum(fused_bw2(hh) * w))(h2)
    gr = jax.grad(lambda hh: jnp.sum(
        t._ref_av(g, a_dst, a_src, hh.reshape(-1, t.H, t.D)
                  ).reshape(-1, t.H * t.D) * w))(h2)
    np.testing.assert_allclose(np.asarray(gf), np.asarray(gr),
                               rtol=2e-3, atol=2e-3)


def test_dropout_vjp_fd_per_direction_and_bw2():
    """Dropout-mask consistency on the MIXED r5 layouts: fwd/dsd run on the
    wide-panel fw layout while dsrc runs on the wide bw2 (aliased) layout —
    the coordinate-hashed masks must agree across DIFFERENT panel bases,
    proven by the hand VJP matching central differences at a fixed seed."""
    from cogdl_tpu.data.graph import pad_to
    from cogdl_tpu.ops.pallas.device_layout import prepare_spmm_device
    from cogdl_tpu.ops.pallas.segment_kernels import build_ar, gat_fused_p

    t = TestGatFusedBlocked()
    g = add_self_loops(sbm_graph(num_nodes=600, seed=5))
    g = pad_to(g, ((g.n_pad + 511) // 512) * 512, g.e_pad)
    g = prepare_spmm_device(g, symmetric=True, with_orig=True,
                            panel_rows=1024, panel_rows_bw=512,
                            block_chunks=2, r_tile=512)
    ex = g.extras
    rng = np.random.default_rng(23)
    h = jnp.asarray(rng.normal(size=(g.n_pad, t.H * t.D)).astype(np.float32))
    a_src = jnp.asarray(rng.normal(size=(t.H, t.D)).astype(np.float32))
    a_dst = jnp.asarray(rng.normal(size=(t.H, t.D)).astype(np.float32))
    ar = build_ar(a_src, t.H, t.D)
    al = build_ar(a_dst, t.H, t.D)
    zb = jnp.zeros(0, jnp.int32)
    zf = jnp.zeros(0, jnp.float32)
    w = jnp.asarray(rng.normal(size=h.shape).astype(np.float32))

    def loss(hh):
        h3 = hh.reshape(-1, t.H, t.D)
        out = gat_fused_p(
            t.H, t.D, 0.2, 0.4, 1024, 1024, 512, False,
            jnp.einsum("nhd,hd->nh", h3, a_dst),
            jnp.einsum("nhd,hd->nh", h3, a_src),
            hh, ar, al, jnp.uint32(77),
            ex["spmm_fw_pack"], zb, zf, ex["spmm_fw_ct"], zb,
            ex["spmm_fw_bp"],
            ex["spmm_bw2_pack"], zb, zf, ex["spmm_bw2_ct"], zb,
            ex["spmm_bw2_bp"])
        return jnp.sum(out * w)

    grad = jax.grad(loss)(h)
    for k in range(2):
        v = jnp.asarray(rng.normal(size=h.shape).astype(np.float32))
        eps = 1e-3
        fd = (float(loss(h + eps * v)) - float(loss(h - eps * v))) / (2 * eps)
        an = float(jnp.vdot(grad, v))
        assert abs(fd - an) <= 2e-2 * max(abs(fd), abs(an), 1.0), (k, fd, an)
