"""Parity tests for the v6 windowed-gather whole-attention kernel
(ops/pallas/segment_attention_window.py) against a plain-XLA oracle that
caps with jnp.max and differentiates straight through it — the same
oracle contract as the v5 autocap tests (test_pallas_kernel.py).

The windowed op requires a BANDED edge list: every dst tile's senders
fall within `window` rows of the tile's minimum sender (tile_lo). The
fixtures build that directly (senders near receivers); production gets
it from canonicalize(reorder='rcm', src_windows=True). A window equal to
the whole node table (tile_lo all-zero) degenerates to a fully
VMEM-resident gather and must also be exact — that's the mode small
graphs (Cora scale) use without any reordering.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gat_pytorch_tpu.graph.transforms import compute_src_windows
from gat_pytorch_tpu.ops.pallas.segment_attention_window import (
    fused_gat_window)


@pytest.fixture(autouse=True)
def _restore_v6_dtype():
    saved = os.environ.get("GAT_TPU_V6_DTYPE")
    yield
    if saved is None:
        os.environ.pop("GAT_TPU_V6_DTYPE", None)
    else:
        os.environ["GAT_TPU_V6_DTYPE"] = saved


def _banded_graph(rng, n, e_real, pad, bandw):
    recv = np.sort(rng.integers(0, n, e_real)).astype(np.int32)
    send = np.clip(recv + rng.integers(-bandw // 2, bandw // 2, e_real),
                   0, n - 1).astype(np.int32)
    recv = np.concatenate([recv, np.full(pad, n - 1, np.int32)])
    send = np.concatenate([send, np.full(pad, n - 1, np.int32)])
    return send, recv


def _oracle(hh, aa, ss, dd, sd, rc, e_real, n, nh, f, slope):
    e = sd.shape[0]
    raw = jnp.take(hh, sd, axis=0) @ aa + jnp.take(ss, rc, axis=0)
    mask = (jnp.arange(e) < e_real)[:, None]
    cap = jnp.max(jnp.where(mask, raw, -1e30))
    pre = raw - cap
    ex = jnp.exp(jnp.where(pre > 0, pre, slope * pre)) * mask
    denom = jax.ops.segment_sum(ex, rc, num_segments=n,
                                indices_are_sorted=True)
    num = ex if dd is None else ex * dd
    w = jnp.take(hh, sd, axis=0).reshape(e, nh, f) * num[:, :, None]
    agg = jax.ops.segment_sum(w, rc, num_segments=n,
                              indices_are_sorted=True)
    inv = jnp.where(denom > 0, 1.0 / (denom + 1e-8), 0.0)
    return (agg * inv[:, :, None]).reshape(n, nh * f)


def _compare(n, e_real, pad, nh, f, window, tile_lo, send, recv,
             with_dropout, seed, atol=2e-5, fwd_atol=1e-5):
    if fwd_atol <= 1e-4:  # tight parity: pin the f32 contraction path
        os.environ["GAT_TPU_V6_DTYPE"] = "float32"
    rng = np.random.default_rng(seed)
    e = e_real + pad
    slope = 0.01
    h = jnp.asarray(rng.normal(size=(n, nh * f)).astype(np.float32))
    a_src = jnp.asarray((rng.normal(size=(nh * f, nh))
                         / np.sqrt(nh * f)).astype(np.float32))
    s_dst = jnp.asarray(rng.normal(size=(n, nh)).astype(np.float32))
    drop = (jnp.asarray((rng.random((e, nh)) > 0.4).astype(np.float32)
                        / 0.6) if with_dropout else None)
    sd, rc, tl = map(jnp.asarray, (send, recv, tile_lo))
    er = jnp.int32(e_real)
    an = (0, 1, 2) + ((3,) if with_dropout else ())

    def lt(*a):
        o = fused_gat_window(*a, sd, rc, er, tl, n, nh, f, window,
                             1e-8, slope, 256, 128, True)
        return jnp.sum(jnp.sin(o)), o

    def lr(*a):
        o = _oracle(*a, sd, rc, er, n, nh, f, slope)
        return jnp.sum(jnp.sin(o)), o

    (_, ot), gt = jax.value_and_grad(lt, argnums=an, has_aux=True)(
        h, a_src, s_dst, drop)
    (_, orr), gr = jax.value_and_grad(lr, argnums=an, has_aux=True)(
        h, a_src, s_dst, drop)
    np.testing.assert_allclose(np.asarray(ot), np.asarray(orr),
                               rtol=fwd_atol, atol=fwd_atol)
    # absolute tolerance on normalised grads: under the global cap all
    # logits share one LeakyReLU linear region, so d(s_dst) is
    # structurally ~0 (per-segment shifts cancel in softmax) and a
    # relative metric only amplifies noise — same contract as the v5
    # autocap tests.
    for a, b, nm in zip(gt, gr, ("h", "a_src", "s_dst", "drop")):
        scale = max(float(np.abs(np.asarray(b)).max()), 1.0)
        np.testing.assert_allclose(np.asarray(a) / scale,
                                   np.asarray(b) / scale,
                                   rtol=0, atol=atol, err_msg=nm)


@pytest.mark.parametrize("with_dropout", [False, True])
@pytest.mark.parametrize("nh,f", [(2, 8), (8, 16), (6, 121)])
def test_v6_banded_matches_oracle(with_dropout, nh, f):
    """Banded graph, window from compute_src_windows: forward + all
    gradients (h, a_src, s_dst, drop) vs the straight-through-max
    oracle. (8, 16) pins nhf == nhfl (no lane pad); (6, 121) pins the
    padded-lane case."""
    rng = np.random.default_rng(0)
    n, e_real, pad = 1024, 6000, 64
    send, recv = _banded_graph(rng, n, e_real, pad, bandw=200)
    tile_lo, band = compute_src_windows(send, recv, e_real, n)
    window = ((band + 7) // 8) * 8
    assert 0 < window < n  # the fixture must exercise real windowing
    _compare(n, e_real, pad, nh, f, window, tile_lo, send, recv,
             with_dropout, seed=1)


def test_v6_whole_table_mode():
    """tile_lo all-zero + window == node-table rows: the degenerate
    'resident table' mode small graphs use without reordering."""
    rng = np.random.default_rng(3)
    n, e_real, pad = 256, 1500, 36
    recv = np.concatenate([np.sort(rng.integers(0, n, e_real)),
                           np.full(pad, n - 1)]).astype(np.int32)
    send = np.concatenate([rng.integers(0, n, e_real),
                           np.full(pad, n - 1)]).astype(np.int32)
    tile_lo = np.zeros((n + 127) // 128, np.int32)
    _compare(n, e_real, pad, 2, 8, n, tile_lo, send, recv,
             with_dropout=False, seed=4)


def test_v6_empty_tiles_and_isolated_nodes():
    """Dst tiles with no in-edges (tile_lo = INT32_MAX) must produce
    zero rows, not garbage."""
    rng = np.random.default_rng(5)
    n, e_real, pad = 512, 300, 20
    # all real edges land in the first 128-row tile
    recv = np.sort(rng.integers(0, 100, e_real)).astype(np.int32)
    send = np.clip(recv + rng.integers(-30, 30, e_real), 0,
                   n - 1).astype(np.int32)
    recv = np.concatenate([recv, np.full(pad, n - 1, np.int32)])
    send = np.concatenate([send, np.full(pad, n - 1, np.int32)])
    tile_lo, band = compute_src_windows(send, recv, e_real, n)
    window = ((band + 7) // 8) * 8
    _compare(n, e_real, pad, 2, 8, window, tile_lo, send, recv,
             with_dropout=False, seed=6)


def test_v6_bf16_contractions_close(monkeypatch):
    """The default contraction dtype (bf16, see _v6_dtype) halves the
    one-hot contraction cost — v6 is MXU-bound, unlike the stream-bound
    v5; results must stay within bf16 rounding of the f32 oracle."""
    monkeypatch.delenv("GAT_TPU_V6_DTYPE", raising=False)  # bf16 default
    rng = np.random.default_rng(7)
    n, e_real, pad = 512, 3000, 40
    send, recv = _banded_graph(rng, n, e_real, pad, bandw=128)
    tile_lo, band = compute_src_windows(send, recv, e_real, n)
    window = ((band + 7) // 8) * 8
    _compare(n, e_real, pad, 4, 16, window, tile_lo, send, recv,
             with_dropout=False, seed=8, atol=2e-2, fwd_atol=5e-2)


# ---------------------------------------------------------------------------
# v7 block-local windows (Graph.block_layout, fused_gat_window_v7)
# ---------------------------------------------------------------------------

def _v7_graph(seed, n=1500, e=9000, band=400, feats=8):
    from gat_pytorch_tpu.graph import transforms as T
    rng = np.random.default_rng(seed)
    recv = rng.integers(0, n, e)
    send = np.clip(recv + rng.integers(-band // 2, band // 2, e),
                   0, n - 1)
    x = rng.normal(size=(n, feats)).astype(np.float32)
    return T.canonicalize(x, send, recv, src_windows=True), rng


@pytest.mark.parametrize("band", [400, 1100])
def test_block_layout_invariants(band):
    """compute_block_layout: real-edge multiset preserved, per-tile
    src-sorted eb-aligned ranges, every block's senders inside its
    128-aligned wb window, pads recv == -1. band=1100 exercises the
    span-capped greedy blocking (outlier blocks split so the static wb
    tracks the typical span, not the max)."""
    g, _ = _v7_graph(0, band=band)
    bl = g.block_layout
    s7, r7 = np.asarray(bl.send), np.asarray(bl.recv)
    tp, bb = np.asarray(bl.tile_ptr), np.asarray(bl.base)
    em = np.asarray(g.edge_mask)
    ref = sorted(zip(np.asarray(g.senders)[em].tolist(),
                     np.asarray(g.receivers)[em].tolist()))
    got = sorted(zip(s7[r7 >= 0].tolist(), r7[r7 >= 0].tolist()))
    assert ref == got
    assert bl.wb % 128 == 0 and bl.window % 128 == 0
    assert bl.wb <= bl.window
    for ti in range(len(tp) - 1):
        lo, hi = tp[ti], tp[ti + 1]
        assert lo % bl.eb == 0 and hi % bl.eb == 0
        rr, ss = r7[lo:hi], s7[lo:hi]
        real = rr >= 0
        assert ((rr[real] // bl.nb) == ti).all()
        assert (np.diff(ss[real]) >= 0).all()
    for gi in range(s7.shape[0] // bl.eb):
        blk = s7[gi * bl.eb:(gi + 1) * bl.eb]
        assert bb[gi] % 128 == 0
        assert (blk >= bb[gi]).all() and (blk < bb[gi] + bl.wb).all()


@pytest.mark.parametrize("with_dropout,nh,f",
                         [(False, 4, 8), (True, 8, 8), (False, 1, 7)])
def test_v7_matches_oracle(with_dropout, nh, f):
    """fused_gat_window_v7 vs the dense oracle over the layout's real
    edges: forward + gradients (h, a_src, s_dst, drop), f32 path."""
    os.environ["GAT_TPU_V6_DTYPE"] = "float32"
    from gat_pytorch_tpu.ops.pallas.segment_attention_window import (
        fused_gat_window_v7)
    g, rng = _v7_graph(1)
    bl = g.block_layout
    n = g.num_nodes
    e7 = bl.num_slots
    h = jnp.asarray((rng.normal(size=(n, nh * f)) * 0.1).astype(np.float32))
    a_src = jnp.asarray((rng.normal(size=(nh * f, nh))
                         / np.sqrt(nh * f)).astype(np.float32))
    s_dst = jnp.asarray((rng.normal(size=(n, nh)) * 0.1).astype(np.float32))
    drop = (jnp.asarray((rng.random((e7, nh)) > 0.4).astype(np.float32)
                        / 0.6) if with_dropout else None)
    s7, r7 = np.asarray(bl.send), np.asarray(bl.recv)
    real = np.flatnonzero(r7 >= 0)
    sd = jnp.asarray(s7[real])
    rc = jnp.asarray(r7[real])
    an = (0, 1, 2) + ((3,) if with_dropout else ())

    def lv7(*a):
        o = fused_gat_window_v7(*a, bl.send, bl.recv, bl.base,
                                bl.tile_ptr, bl.tile_base, None, n, nh, f,
                                bl.window, bl.wb, 1e-8, 0.01, bl.eb,
                                bl.nb, True, bl.dmax)
        return jnp.sum(jnp.sin(o)), o

    def lref(h_, a_, s_, d_):
        raw = jnp.take(h_, sd, axis=0) @ a_ + jnp.take(s_, rc, axis=0)
        cap = jnp.max(raw)
        pre = raw - cap
        ex = jnp.exp(jnp.where(pre > 0, pre, 0.01 * pre))
        den = jax.ops.segment_sum(ex, rc, num_segments=n)
        num = ex if d_ is None else ex * jnp.take(d_, jnp.asarray(real),
                                                  axis=0)
        w = (jnp.take(h_, sd, axis=0).reshape(-1, nh, f)
             * num[:, :, None])
        agg = jax.ops.segment_sum(w, rc, num_segments=n)
        inv = jnp.where(den > 0, 1.0 / (den + 1e-8), 0.0)
        o = (agg * inv[:, :, None]).reshape(n, nh * f)
        return jnp.sum(jnp.sin(o)), o

    (_, o7), g7 = jax.value_and_grad(lv7, argnums=an, has_aux=True)(
        h, a_src, s_dst, drop)
    (_, oo), go = jax.value_and_grad(lref, argnums=an, has_aux=True)(
        h, a_src, s_dst, drop)
    np.testing.assert_allclose(np.asarray(o7), np.asarray(oo),
                               rtol=3e-5, atol=3e-5)
    for a, b, nm in zip(g7, go, ("h", "a_src", "s_dst", "drop")):
        scale = max(float(np.abs(np.asarray(b)).max()), 1.0)
        np.testing.assert_allclose(np.asarray(a) / scale,
                                   np.asarray(b) / scale,
                                   rtol=0, atol=2e-5, err_msg=nm)


@pytest.mark.parametrize("dmak", [1, 16])
def test_v7_global_stream_dmak_edges(dmak, monkeypatch):
    """The GLOBAL combined meta+raw stream (one group prefetch distance
    across tile boundaries, single end-of-phase drain) at the dmak
    extremes: dmak=1 (every block its own group; flush condition
    j==dmak-1 always true) and dmak=16 > total blocks (ONE partial
    global group: bootstrap, flush-at-last-block, and drain all hit the
    same group). The fixture's ~10 blocks over 3 tiles also makes
    dmak=16's single group span every tile boundary. Forward-only f32
    parity vs the dense oracle."""
    monkeypatch.setenv("GAT_TPU_V7_DMAK", str(dmak))
    os.environ["GAT_TPU_V6_DTYPE"] = "float32"
    from gat_pytorch_tpu.ops.pallas.segment_attention_window import (
        fused_gat_window_v7)
    g, rng = _v7_graph(3)
    bl = g.block_layout
    n = g.num_nodes
    nh, f = 4, 8
    h = jnp.asarray((rng.normal(size=(n, nh * f)) * 0.1).astype(np.float32))
    a_src = jnp.asarray((rng.normal(size=(nh * f, nh))
                         / np.sqrt(nh * f)).astype(np.float32))
    s_dst = jnp.asarray((rng.normal(size=(n, nh)) * 0.1).astype(np.float32))
    s7, r7 = np.asarray(bl.send), np.asarray(bl.recv)
    real = np.flatnonzero(r7 >= 0)
    sd, rc = jnp.asarray(s7[real]), jnp.asarray(r7[real])

    def lv7(h_, a_, s_):
        o = fused_gat_window_v7(h_, a_, s_, None, bl.send, bl.recv,
                                bl.base, bl.tile_ptr, bl.tile_base,
                                None, n,
                                nh, f, bl.window, bl.wb, 1e-8, 0.01,
                                bl.eb, bl.nb, True, bl.dmax)
        return jnp.sum(jnp.sin(o)), o

    def lref(h_, a_, s_):
        raw = jnp.take(h_, sd, axis=0) @ a_ + jnp.take(s_, rc, axis=0)
        pre = raw - jnp.max(raw)
        ex = jnp.exp(jnp.where(pre > 0, pre, 0.01 * pre))
        den = jax.ops.segment_sum(ex, rc, num_segments=n)
        w = (jnp.take(h_, sd, axis=0).reshape(-1, nh, f)
             * ex[:, :, None])
        agg = jax.ops.segment_sum(w, rc, num_segments=n)
        inv = jnp.where(den > 0, 1.0 / (den + 1e-8), 0.0)
        o = (agg * inv[:, :, None]).reshape(n, nh * f)
        return jnp.sum(jnp.sin(o)), o

    (_, o7), g7 = jax.value_and_grad(lv7, argnums=(0, 1, 2),
                                     has_aux=True)(h, a_src, s_dst)
    (_, oo), go = jax.value_and_grad(lref, argnums=(0, 1, 2),
                                     has_aux=True)(h, a_src, s_dst)
    np.testing.assert_allclose(np.asarray(o7), np.asarray(oo),
                               rtol=3e-5, atol=3e-5)
    for a, b, nm in zip(g7, go, ("h", "a_src", "s_dst")):
        scale = max(float(np.abs(np.asarray(b)).max()), 1.0)
        np.testing.assert_allclose(np.asarray(a) / scale,
                                   np.asarray(b) / scale,
                                   rtol=0, atol=2e-5, err_msg=nm)


def test_v7_model_gate_engages_and_matches_xla():
    """gat_model_apply routes banded graphs with a block_layout through
    fused_gat_window_v7 in auto mode (interpret on CPU) and matches the
    XLA backend."""
    os.environ["GAT_TPU_V6_DTYPE"] = "float32"
    from gat_pytorch_tpu.models import gat as G
    g, rng = _v7_graph(2, n=2500, e=16000, band=300, feats=12)
    assert g.block_layout is not None
    cfg = G.GATConfig(
        num_input_node_features=12, num_layers=2,
        num_heads_per_layer=[4, 4], heads_concat_per_layer=[True, False],
        head_output_features_per_layer=[12, 8, 4], num_classes=4,
        add_skip_connection=[False, False], dropout=0.0)
    params = G.init_gat_model(jax.random.key(0), cfg)
    # narrow certification must hold for the auto gate on this graph
    assert g.block_layout.wb * 128 <= 200 * 1024
    from gat_pytorch_tpu.ops.pallas import segment_attention_window as W
    calls = []
    orig = W.fused_gat_window_v7

    def counted(*a, **k):
        calls.append(1)
        return orig(*a, **k)

    W.fused_gat_window_v7, saved = counted, orig
    try:
        out_p = G.gat_model_apply(params, cfg, g, training=False,
                                  backend="pallas")
    finally:
        W.fused_gat_window_v7 = saved
    assert calls, "v7 gate did not engage"
    out_x = G.gat_model_apply(params, cfg, g, training=False,
                              backend="xla")
    np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_x),
                               rtol=5e-5, atol=5e-5)


def test_v7_sliding_writeback_matches_rmw():
    """The sliding d(h) accumulator (layout-certified monotone bases,
    BlockLayout.dmax >= 0) must produce the same outputs and gradients
    as the legacy per-tile RMW writeback (dmax = -1 disables the
    certificate). d(h) is compared at 1-ulp tolerance: rows whose
    contributions span multiple tiles are summed in a different order
    by the two writeback strategies (VMEM-carried accumulation vs
    HBM read-add-write), so bitwise equality cannot hold in general —
    the round-3 auto block-size choice surfaced such a geometry."""
    os.environ["GAT_TPU_V6_DTYPE"] = "float32"
    from gat_pytorch_tpu.ops.pallas.segment_attention_window import (
        fused_gat_window_v7)
    nh, f = 2, 8
    g, rng = _v7_graph(4)
    bl = g.block_layout
    assert bl.dmax >= 0, "banded layout should certify monotone bases"
    n = g.num_nodes
    h = jnp.asarray((rng.normal(size=(n, nh * f)) * 0.1).astype(np.float32))
    a_src = jnp.asarray((rng.normal(size=(nh * f, nh))
                         / np.sqrt(nh * f)).astype(np.float32))
    s_dst = jnp.asarray((rng.normal(size=(n, nh)) * 0.1).astype(np.float32))

    def loss(dmax):
        def fn(h_, a_, s_):
            o = fused_gat_window_v7(h_, a_, s_, None, bl.send, bl.recv,
                                    bl.base, bl.tile_ptr, bl.tile_base,
                                    None, n, nh, f, bl.window, bl.wb,
                                    1e-8, 0.01, bl.eb, bl.nb, True,
                                    dmax)
            return jnp.sum(jnp.sin(o)), o
        return jax.value_and_grad(fn, argnums=(0, 1, 2), has_aux=True)(
            h, a_src, s_dst)

    (_, o_s), g_s = loss(bl.dmax)
    (_, o_r), g_r = loss(-1)
    np.testing.assert_allclose(np.asarray(o_s), np.asarray(o_r),
                               rtol=0, atol=1e-6)
    for a, b, nm in zip(g_s, g_r, ("h", "a_src", "s_dst")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-6,
                                      err_msg=nm)


def test_v10_single_sweep_matches_two_phase(monkeypatch):
    """The v10 single-sweep forward (merged cap+attention, XLA-epilogue
    normalisation) vs the legacy 2-phase mode: same math up to the
    1-ulp-class rounding of the deferred normalisation; gradients
    (h, a_src, s_dst) must agree too, including the cap's argmax chain
    (v10 derives d(cap) from the eps' epilogue in closed form)."""
    os.environ["GAT_TPU_V6_DTYPE"] = "float32"
    from gat_pytorch_tpu.ops.pallas.segment_attention_window import (
        fused_gat_window_v7)
    g, rng = _v7_graph(3)
    bl = g.block_layout
    n = g.num_nodes
    nh, f = 4, 8
    h = jnp.asarray((rng.normal(size=(n, nh * f)) * 0.3).astype(np.float32))
    a_src = jnp.asarray((rng.normal(size=(nh * f, nh))
                         / np.sqrt(nh * f)).astype(np.float32))
    s_dst = jnp.asarray((rng.normal(size=(n, nh)) * 0.3).astype(np.float32))

    def run():
        def fn(h_, a_, s_):
            o = fused_gat_window_v7(h_, a_, s_, None, bl.send, bl.recv,
                                    bl.base, bl.tile_ptr, bl.tile_base,
                                    None, n, nh, f, bl.window, bl.wb,
                                    1e-8, 0.01, bl.eb, bl.nb, True,
                                    bl.dmax)
            return jnp.sum(jnp.sin(o)), o
        return jax.value_and_grad(fn, argnums=(0, 1, 2), has_aux=True)(
            h, a_src, s_dst)

    monkeypatch.setenv("GAT_TPU_V10", "1")
    (_, o1), g1 = run()
    monkeypatch.setenv("GAT_TPU_V10", "0")
    (_, o0), g0 = run()
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o0),
                               rtol=1e-5, atol=1e-6)
    for a, b, nm in zip(g1, g0, ("h", "a_src", "s_dst")):
        scale = max(float(np.abs(np.asarray(b)).max()), 1.0)
        np.testing.assert_allclose(np.asarray(a) / scale,
                                   np.asarray(b) / scale,
                                   rtol=0, atol=1e-5, err_msg=nm)


def test_v10_score_bound_invariance(monkeypatch):
    """out is algebraically invariant to the score_bound B (the epilogue
    divides the B-scaling back out, eps term included). A wrong eps'
    exponent or a missed shift would break this immediately."""
    os.environ["GAT_TPU_V6_DTYPE"] = "float32"
    monkeypatch.setenv("GAT_TPU_V10", "1")
    from gat_pytorch_tpu.ops.pallas.segment_attention_window import (
        fused_gat_window_v7)
    g, rng = _v7_graph(2)
    bl = g.block_layout
    n = g.num_nodes
    nh, f = 4, 8
    h = jnp.asarray((rng.normal(size=(n, nh * f)) * 0.3).astype(np.float32))
    a_src = jnp.asarray((rng.normal(size=(nh * f, nh))
                         / np.sqrt(nh * f)).astype(np.float32))
    s_dst = jnp.asarray((rng.normal(size=(n, nh)) * 0.3).astype(np.float32))

    def run(bound):
        return fused_gat_window_v7(
            h, a_src, s_dst, None, bl.send, bl.recv, bl.base,
            bl.tile_ptr, bl.tile_base, bound, n, nh, f, bl.window,
            bl.wb, 1e-8, 0.01, bl.eb, bl.nb, True, bl.dmax)

    o_auto = np.asarray(run(None))
    tight = float(np.max(h @ np.asarray(a_src)) + np.max(np.asarray(s_dst)))
    for bound in (tight, tight + 7.0, tight + 300.0):
        o_b = np.asarray(run(jnp.float32(bound)))
        np.testing.assert_allclose(o_b, o_auto, rtol=2e-5, atol=2e-6,
                                   err_msg=f"bound={bound}")


def test_v7_bf16_default_mode_close(monkeypatch):
    """v10+v11 in the DEFAULT bf16 contraction mode (gathered-payload
    stream active: the backward consumes the forward's streamed bf16
    rows instead of re-gathering — an exact bf16 selection either way):
    fwd + grads must sit within the bf16 payload-rounding envelope of
    the f32 oracle."""
    monkeypatch.delenv("GAT_TPU_V6_DTYPE", raising=False)  # bf16 default
    monkeypatch.setenv("GAT_TPU_V10", "1")
    from gat_pytorch_tpu.ops.pallas.segment_attention_window import (
        fused_gat_window_v7)
    g, rng = _v7_graph(2)
    bl = g.block_layout
    n = g.num_nodes
    nh, f = 8, 16
    h = jnp.asarray((rng.normal(size=(n, nh * f)) * 0.3).astype(np.float32))
    a_src = jnp.asarray((rng.normal(size=(nh * f, nh))
                         / np.sqrt(nh * f)).astype(np.float32))
    s_dst = jnp.asarray((rng.normal(size=(n, nh)) * 0.3).astype(np.float32))
    s7, r7 = np.asarray(bl.send), np.asarray(bl.recv)
    real = np.flatnonzero(r7 >= 0)
    sd, rc = jnp.asarray(s7[real]), jnp.asarray(r7[real])

    def lv7(h_, a_, s_):
        o = fused_gat_window_v7(h_, a_, s_, None, bl.send, bl.recv,
                                bl.base, bl.tile_ptr, bl.tile_base,
                                None, n, nh, f, bl.window, bl.wb,
                                1e-8, 0.01, bl.eb, bl.nb, True, bl.dmax)
        return jnp.sum(jnp.sin(o)), o

    def lref(h_, a_, s_):
        raw = jnp.take(h_, sd, axis=0) @ a_ + jnp.take(s_, rc, axis=0)
        pre = raw - jnp.max(raw)
        ex = jnp.exp(jnp.where(pre > 0, pre, 0.01 * pre))
        den = jax.ops.segment_sum(ex, rc, num_segments=n)
        w = (jnp.take(h_, sd, axis=0).reshape(-1, nh, f)
             * ex[:, :, None])
        agg = jax.ops.segment_sum(w, rc, num_segments=n)
        inv = jnp.where(den > 0, 1.0 / (den + 1e-8), 0.0)
        o = (agg * inv[:, :, None]).reshape(n, nh * f)
        return jnp.sum(jnp.sin(o)), o

    (_, o7), g7 = jax.value_and_grad(lv7, argnums=(0, 1, 2),
                                     has_aux=True)(h, a_src, s_dst)
    (_, oo), go = jax.value_and_grad(lref, argnums=(0, 1, 2),
                                     has_aux=True)(h, a_src, s_dst)
    np.testing.assert_allclose(np.asarray(o7), np.asarray(oo),
                               rtol=0, atol=5e-2)
    for a, b, nm in zip(g7, go, ("h", "a_src", "s_dst")):
        scale = max(float(np.abs(np.asarray(b)).max()), 1.0)
        np.testing.assert_allclose(np.asarray(a) / scale,
                                   np.asarray(b) / scale,
                                   rtol=0, atol=2e-2, err_msg=nm)


@pytest.mark.parametrize("dmak", [1, 4, 16])
def test_v11_stream_matches_recompute(monkeypatch, dmak):
    """v11 gathered-payload stream vs the backward recompute must be
    BIT-IDENTICAL in bf16 mode: a one-hot gather of bf16 values is an
    exact selection, so streaming the forward's result is the same
    numbers the backward's own contraction would produce. Swept over
    the dmak group-size extremes (1 = every block its own group,
    16 > total blocks = one partial global group spanning every tile
    boundary) — the gpay stream rides the same group schedule as the
    comb stream and must survive the same edges."""
    monkeypatch.delenv("GAT_TPU_V6_DTYPE", raising=False)  # bf16 default
    monkeypatch.setenv("GAT_TPU_V10", "1")
    monkeypatch.setenv("GAT_TPU_V7_DMAK", str(dmak))
    from gat_pytorch_tpu.ops.pallas.segment_attention_window import (
        fused_gat_window_v7)
    g, rng = _v7_graph(3)
    bl = g.block_layout
    n = g.num_nodes
    nh, f = 4, 8
    e7 = int(bl.send.shape[0])
    h = jnp.asarray((rng.normal(size=(n, nh * f)) * 0.3).astype(np.float32))
    a_src = jnp.asarray((rng.normal(size=(nh * f, nh))
                         / np.sqrt(nh * f)).astype(np.float32))
    s_dst = jnp.asarray((rng.normal(size=(n, nh)) * 0.3).astype(np.float32))
    drop = jnp.asarray(((rng.random((e7, nh)) > 0.4) / 0.6
                        ).astype(np.float32))

    def run():
        def fn(h_, a_, s_, d_):
            o = fused_gat_window_v7(h_, a_, s_, d_, bl.send, bl.recv,
                                    bl.base, bl.tile_ptr, bl.tile_base,
                                    None, n, nh, f, bl.window, bl.wb,
                                    1e-8, 0.01, bl.eb, bl.nb, True,
                                    bl.dmax)
            return jnp.sum(jnp.sin(o)), o
        return jax.value_and_grad(fn, argnums=(0, 1, 2, 3),
                                  has_aux=True)(h, a_src, s_dst, drop)

    monkeypatch.setenv("GAT_TPU_V11", "1")
    (_, o1), g1 = run()
    monkeypatch.setenv("GAT_TPU_V11", "0")
    (_, o0), g0 = run()
    np.testing.assert_array_equal(np.asarray(o1), np.asarray(o0))
    for a, b, nm in zip(g1, g0, ("h", "a_src", "s_dst", "drop")):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                      err_msg=nm)


@pytest.mark.parametrize("nh,f", [(8, 8), (2, 8), (1, 7)])
def test_v12_packed_window_parity(monkeypatch, nh, f):
    """v12 n-pack window packing (round 4): layers with nh*f <= 64 pack
    128//slot nodes per 128-lane window row (slot 64/16/8 here); output
    AND gradients must match the XLA path bit-for-tolerance, and the
    pack gate must actually engage (GAT_TPU_V12=0 A/B)."""
    import numpy as np

    from gat_pytorch_tpu.graph import transforms as T
    from gat_pytorch_tpu.models import gat
    from gat_pytorch_tpu.ops.pallas.segment_attention_window import \
        _pair_slot
    monkeypatch.setenv("GAT_TPU_V6", "1")
    monkeypatch.setenv("GAT_TPU_V6_DTYPE", "float32")
    assert _pair_slot(nh * f) > 0

    rng = np.random.default_rng(7)
    n, f_in = 400, 12
    s = np.repeat(np.arange(n), 4)
    r = np.clip(s + rng.integers(-30, 30, n * 4), 0, n - 1)
    x = rng.normal(size=(n, f_in)).astype(np.float32)
    g = T.canonicalize(x, s, r, src_windows=True, pad_multiple=128)
    cfg = gat.GATConfig(
        num_input_node_features=f_in, num_layers=1,
        num_heads_per_layer=[nh], heads_concat_per_layer=[True],
        head_output_features_per_layer=[f_in, f], num_classes=nh * f,
        add_skip_connection=[False], dropout=0.0)
    params = gat.init_gat_model(jax.random.key(1), cfg)

    def loss(p, backend):
        o = gat.gat_model_apply(p, cfg, g, training=False,
                                backend=backend)
        return jnp.mean(o ** 2), o

    (lw, want), gw = jax.value_and_grad(loss, has_aux=True)(params, "xla")
    (lp, got), gp = jax.value_and_grad(loss, has_aux=True)(params,
                                                           "pallas")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-5)
    for (path, a), (_, b) in zip(
            jax.tree_util.tree_leaves_with_path(gp),
            jax.tree_util.tree_leaves_with_path(gw)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-6,
            err_msg=f"grad mismatch at {jax.tree_util.keystr(path)}")
