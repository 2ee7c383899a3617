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
    ex = jnp.exp(jnp.where(pre >= 0, pre, slope * pre)) * mask
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
