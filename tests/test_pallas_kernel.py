"""Fused segment-attention Pallas kernel vs XLA oracle (interpret mode).

Forward and backward parity on random dst-sorted graphs, including
padding edges (-inf logits), attention dropout masks, and the full GAT
layer with backend="pallas" vs backend="xla".
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gat_pytorch_tpu.graph import transforms as T
from gat_pytorch_tpu.models import gat
from gat_pytorch_tpu.ops.pallas import segment_attention as fsa


def make_edges(num_nodes, num_edges, nh, f, seed=0, pad_edges=32):
    rng = np.random.default_rng(seed)
    recv = np.sort(rng.integers(0, num_nodes, num_edges))
    e_pad = num_edges + pad_edges
    recv = np.concatenate([recv, np.full(pad_edges, num_nodes - 1)])
    logits = rng.normal(size=(e_pad, nh)).astype(np.float32)
    logits[num_edges:] = fsa.NEG_INF
    h_src = rng.normal(size=(e_pad, nh * f)).astype(np.float32)
    return (jnp.asarray(logits), jnp.asarray(h_src),
            jnp.asarray(recv.astype(np.int32)))


@pytest.mark.parametrize("num_nodes,num_edges,nh,f", [
    (128, 500, 2, 8),     # single tile
    (384, 2000, 4, 16),   # multiple tiles, multiple edge blocks
    (256, 100, 1, 8),     # sparse: some tiles empty
])
def test_forward_matches_oracle(num_nodes, num_edges, nh, f):
    logits, h_src, recv = make_edges(num_nodes, num_edges, nh, f)
    got = fsa.fused_segment_attention(logits, h_src, recv, None,
                                      num_nodes, nh, f, 1e-8, 256, 128,
                                      True)
    want = fsa.reference_segment_attention(logits, h_src, recv, None,
                                           num_nodes, nh, f)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_forward_with_dropout_mask():
    num_nodes, num_edges, nh, f = 256, 1500, 2, 8
    logits, h_src, recv = make_edges(num_nodes, num_edges, nh, f, seed=1)
    keep = jax.random.bernoulli(jax.random.key(0), 0.6,
                                (logits.shape[0], nh))
    drop = keep.astype(jnp.float32) / 0.6
    got = fsa.fused_segment_attention(logits, h_src, recv, drop,
                                      num_nodes, nh, f, 1e-8, 256, 128,
                                      True)
    want = fsa.reference_segment_attention(logits, h_src, recv, drop,
                                           num_nodes, nh, f)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_custom_vjp_matches_oracle_grads():
    num_nodes, num_edges, nh, f = 256, 1200, 2, 8
    logits, h_src, recv = make_edges(num_nodes, num_edges, nh, f, seed=2)

    def loss_fused(lg, hs):
        out = fsa.fused_segment_attention(lg, hs, recv, None,
                                          num_nodes, nh, f, 1e-8, 256, 128,
                                          True)
        return jnp.sum(jnp.sin(out))

    def loss_ref(lg, hs):
        out = fsa.reference_segment_attention(lg, hs, recv, None,
                                              num_nodes, nh, f)
        return jnp.sum(jnp.sin(out))

    g_fused = jax.grad(loss_fused, argnums=(0, 1))(logits, h_src)
    g_ref = jax.grad(loss_ref, argnums=(0, 1))(logits, h_src)
    for a, b in zip(g_fused, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_vjp_with_dropout_mask():
    num_nodes, num_edges, nh, f = 128, 700, 2, 8
    logits, h_src, recv = make_edges(num_nodes, num_edges, nh, f, seed=3)
    keep = jax.random.bernoulli(jax.random.key(1), 0.5,
                                (logits.shape[0], nh))
    drop = keep.astype(jnp.float32) / 0.5

    def loss(fn):
        def inner(lg, hs):
            return jnp.sum(fn(lg, hs, recv, drop, num_nodes, nh, f) ** 2)
        return inner

    fused = lambda *a: fsa.fused_segment_attention(  # noqa: E731
        *a[:7], 1e-8, 256, 128, True)
    g_fused = jax.grad(loss(fused), argnums=(0, 1))(logits, h_src)
    g_ref = jax.grad(loss(fsa.reference_segment_attention),
                     argnums=(0, 1))(logits, h_src)
    for a, b in zip(g_fused, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=5e-5)


def _tiny_graph(seed=0, num_nodes=100, nf=12):
    rng = np.random.default_rng(seed)
    senders = np.repeat(np.arange(num_nodes), 4)
    receivers = rng.integers(0, num_nodes, num_nodes * 4)
    x = rng.normal(size=(num_nodes, nf)).astype(np.float32)
    y = rng.integers(0, 3, num_nodes).astype(np.int32)
    return T.canonicalize(x, senders, receivers, y=y)


@pytest.mark.parametrize("paper_faithful", [False, True])
@pytest.mark.parametrize("concat", [True, False])
def test_full_layer_backend_parity(paper_faithful, concat):
    graph = _tiny_graph()
    cfg = gat.GATLayerConfig(in_features=12, out_features=8, num_heads=2,
                             concat=concat, paper_faithful=paper_faithful)
    params = gat.init_gat_layer(jax.random.key(0), cfg)

    kw = dict(x=graph.x, senders=graph.senders, receivers=graph.receivers,
              edge_mask=graph.edge_mask, num_nodes=graph.num_nodes)
    out_x = gat.gat_layer_apply(params, cfg, backend="xla", **kw)
    out_p = gat.gat_layer_apply(params, cfg, backend="pallas", **kw)
    np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_x),
                               rtol=1e-5, atol=1e-5)


def test_full_model_backend_parity_and_grads():
    graph = _tiny_graph(seed=4)
    cfg = gat.GATConfig(
        num_input_node_features=12, num_layers=2,
        num_heads_per_layer=[2, 1], heads_concat_per_layer=[True, False],
        head_output_features_per_layer=[12, 8, 3], num_classes=3,
        add_skip_connection=[False, True], dropout=0.0)
    params = gat.init_gat_model(jax.random.key(1), cfg)

    def loss(p, backend):
        out = gat.gat_model_apply(p, cfg, graph, backend=backend)
        return jnp.sum(out ** 2)

    lx, gx = jax.value_and_grad(lambda p: loss(p, "xla"))(params)
    lp, gp = jax.value_and_grad(lambda p: loss(p, "pallas"))(params)
    np.testing.assert_allclose(float(lp), float(lx), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(gp),
                    jax.tree_util.tree_leaves(gx)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def _table_inputs(num_nodes, num_edges, nh, f, seed=0):
    rng = np.random.default_rng(seed)
    recv = np.sort(rng.integers(0, num_nodes, num_edges)).astype(np.int32)
    logits = rng.normal(size=(num_edges, nh)).astype(np.float32)
    h = rng.normal(size=(num_nodes, nh * f)).astype(np.float32)
    senders = rng.integers(0, num_nodes, num_edges).astype(np.int32)
    order = np.argsort(senders, kind="stable").astype(np.int32)
    return (jnp.asarray(logits), jnp.asarray(h), jnp.asarray(senders),
            jnp.asarray(recv), jnp.asarray(order))


@pytest.mark.parametrize("gather_mode", ["rowk", "lane", "row",
                                         "lane_pib"])
def test_table_op_matches_oracle(gather_mode, monkeypatch):
    """v4 table op (op-owned gather, split edge-major inputs) forward +
    grads vs the XLA oracle, across the gather formulations."""
    monkeypatch.setenv("GAT_TPU_GATHER", gather_mode)
    monkeypatch.setenv("GAT_TPU_GATHER_BARRIER", "1")
    num_nodes, num_edges, nh, f = 256, 1500, 2, 8
    lg, h, snd, rcv, order = _table_inputs(num_nodes, num_edges, nh, f)

    def loss_t(lg, h):
        out = fsa.fused_segment_attention_table(
            lg, h, snd, rcv, None, order, num_nodes, nh, f,
            1e-8, 256, 128, True)
        return jnp.sum(jnp.sin(out)), out

    def loss_r(lg, h):
        out = fsa.reference_segment_attention(
            lg, jnp.take(h, snd, axis=0), rcv, None, num_nodes, nh, f)
        return jnp.sum(jnp.sin(out)), out

    (_, ot), gt = jax.value_and_grad(loss_t, argnums=(0, 1),
                                     has_aux=True)(lg, h)
    (_, orr), gr = jax.value_and_grad(loss_r, argnums=(0, 1),
                                      has_aux=True)(lg, h)
    np.testing.assert_allclose(np.asarray(ot), np.asarray(orr),
                               rtol=1e-5, atol=1e-5)
    for a, b, name in zip(gt, gr, ("logits", "h")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5, err_msg=name)


def test_table_op_dropout_and_no_src_order():
    """Dropout mask grads + the unsorted-scatter d(h) fallback
    (src_order=None)."""
    num_nodes, num_edges, nh, f = 128, 700, 2, 8
    lg, h, snd, rcv, _ = _table_inputs(num_nodes, num_edges, nh, f, seed=3)
    keep = (np.random.default_rng(5).random((num_edges, nh)) > 0.4)
    drop = jnp.asarray(keep.astype(np.float32) / 0.6)

    def loss_t(lg, h, d):
        return jnp.sum(fsa.fused_segment_attention_table(
            lg, h, snd, rcv, d, None, num_nodes, nh, f,
            1e-8, 256, 128, True) ** 2)

    def loss_r(lg, h, d):
        return jnp.sum(fsa.reference_segment_attention(
            lg, jnp.take(h, snd, axis=0), rcv, d, num_nodes, nh, f) ** 2)

    gt = jax.grad(loss_t, argnums=(0, 1, 2))(lg, h, drop)
    gr = jax.grad(loss_r, argnums=(0, 1, 2))(lg, h, drop)
    for a, b in zip(gt, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=5e-5)


def test_table_op_bf16_close(monkeypatch):
    """bf16 feature table: forward within bf16 tolerance, f32 grads."""
    monkeypatch.setenv("GAT_TPU_H_DTYPE", "bfloat16")
    num_nodes, num_edges, nh, f = 256, 1500, 2, 8
    lg, h, snd, rcv, order = _table_inputs(num_nodes, num_edges, nh, f,
                                           seed=7)
    got = fsa.fused_segment_attention_table(
        lg, h, snd, rcv, None, order, num_nodes, nh, f, 1e-8, 256, 128,
        True)
    want = fsa.reference_segment_attention(
        lg, jnp.take(h, snd, axis=0), rcv, None, num_nodes, nh, f)
    rel = float(jnp.max(jnp.abs(got - want))
                / jnp.max(jnp.abs(want)))
    assert rel < 0.02, rel
    g = jax.grad(lambda hh: jnp.sum(fsa.fused_segment_attention_table(
        lg, hh, snd, rcv, None, order, num_nodes, nh, f, 1e-8, 256, 128,
        True) ** 2))(h)
    assert g.dtype == jnp.float32 and bool(jnp.isfinite(g).all())


@pytest.mark.parametrize("with_dropout", [False, True])
@pytest.mark.parametrize("nh,f", [(2, 8), (8, 16)])
def test_v5_in_kernel_logits_matches_oracle(with_dropout, nh, f):
    """v5 whole-attention op (logits computed IN-KERNEL: s_src from h
    rows, s_dst tile broadcast, cap + LeakyReLU + softmax + aggregation
    fused): forward and ALL gradients (h, a_src, s_dst, cap, drop) vs a
    plain-XLA oracle. (8, 16) pins the nhf == nhfl (no lane-pad) case:
    the backward's pad-tail slice degenerates to zero rows there, which
    Mosaic rejects — guarded by a static branch (segment_attention_bwd
    backward_v5 kernel)."""
    rng = np.random.default_rng(0)
    n, e_real, pad = 256, 1500, 36
    e = e_real + pad
    slope = 0.01
    recv = np.concatenate([np.sort(rng.integers(0, n, e_real)),
                           np.full(pad, n - 1)]).astype(np.int32)
    send = np.concatenate([rng.integers(0, n, e_real),
                           np.full(pad, n - 1)]).astype(np.int32)
    order = np.argsort(send, kind="stable").astype(np.int32)
    h = jnp.asarray(rng.normal(size=(n, nh * f)).astype(np.float32))
    a_src = jnp.asarray(rng.normal(size=(nh * f, nh)).astype(np.float32))
    s_dst = jnp.asarray(rng.normal(size=(n, nh)).astype(np.float32))
    cap = jnp.float32(0.7)
    drop = (jnp.asarray((rng.random((e, nh)) > 0.4).astype(np.float32)
                        / 0.6) if with_dropout else None)
    sd, rc, od = map(jnp.asarray, (send, recv, order))
    er = jnp.int32(e_real)

    def oracle(hh, aa, ss, cc, dd):
        raw = jnp.take(hh, sd, axis=0) @ aa + jnp.take(ss, rc, axis=0)
        pre = raw - cc
        ex = jnp.exp(jnp.where(pre > 0, pre, slope * pre))
        ex = jnp.where((jnp.arange(e) < e_real)[:, None], ex, 0.0)
        denom = jax.ops.segment_sum(ex, rc, num_segments=n,
                                    indices_are_sorted=True)
        num = ex if dd is None else ex * dd
        w = jnp.take(hh, sd, axis=0).reshape(e, nh, f) * num[:, :, None]
        agg = jax.ops.segment_sum(w, rc, num_segments=n,
                                  indices_are_sorted=True)
        inv = jnp.where(denom > 0, 1.0 / (denom + 1e-8), 0.0)
        return (agg * inv[:, :, None]).reshape(n, nh * f)

    def lt(hh, aa, ss, cc, dd):
        out = fsa.fused_gat_table(hh, aa, ss, cc, dd, sd, rc, od, er,
                                  n, nh, f, 1e-8, slope, 256, 128, True)
        return jnp.sum(jnp.sin(out)), out

    def lr(hh, aa, ss, cc, dd):
        out = oracle(hh, aa, ss, cc, dd)
        return jnp.sum(jnp.sin(out)), out

    an = (0, 1, 2, 3) + ((4,) if with_dropout else ())
    (_, ot), gt = jax.value_and_grad(lt, argnums=an, has_aux=True)(
        h, a_src, s_dst, cap, drop)
    (_, orr), gr = jax.value_and_grad(lr, argnums=an, has_aux=True)(
        h, a_src, s_dst, cap, drop)
    np.testing.assert_allclose(np.asarray(ot), np.asarray(orr),
                               rtol=1e-5, atol=1e-5)
    for a, b, nm in zip(gt, gr, ("h", "a_src", "s_dst", "cap", "drop")):
        # atol covers reduction-order noise of the 128-lane dots at
        # (8, 16); gradients here are O(1)-O(10)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4, err_msg=nm)


@pytest.mark.parametrize("merged", ["0", "1"])
@pytest.mark.parametrize("with_dropout", [False, True])
@pytest.mark.parametrize("nh,f", [(2, 8), (8, 16), (6, 121)])
def test_v5_autocap_matches_jnp_max_oracle(with_dropout, nh, f, merged,
                                           monkeypatch):
    """fused_gat_table_autocap: the global logit max-cap computed by the
    in-kernel pre-pass (value + argmax code) must match an oracle that
    caps with jnp.max and differentiates straight through it. Gradients
    compared with ABSOLUTE tolerance: d(s_dst) is structurally ~0 here
    (cap >= all raw logits puts every edge in one LeakyReLU linear
    region, so a per-segment s_dst shift cancels in the softmax) and a
    relative metric would just amplify noise."""
    monkeypatch.setenv("GAT_TPU_V5_MERGED", merged)
    rng = np.random.default_rng(3)
    n, e_real, pad = 256, 1500, 36
    e = e_real + pad
    slope = 0.01
    recv = np.concatenate([np.sort(rng.integers(0, n, e_real)),
                           np.full(pad, n - 1)]).astype(np.int32)
    send = np.concatenate([rng.integers(0, n, e_real),
                           np.full(pad, n - 1)]).astype(np.int32)
    order = np.argsort(send, kind="stable").astype(np.int32)
    h = jnp.asarray(rng.normal(size=(n, nh * f)).astype(np.float32))
    a_src = jnp.asarray((rng.normal(size=(nh * f, nh))
                         / np.sqrt(nh * f)).astype(np.float32))
    s_dst = jnp.asarray(rng.normal(size=(n, nh)).astype(np.float32))
    drop = (jnp.asarray((rng.random((e, nh)) > 0.4).astype(np.float32)
                        / 0.6) if with_dropout else None)
    sd, rc, od = map(jnp.asarray, (send, recv, order))
    er = jnp.int32(e_real)

    def auto(hh, aa, ss, dd):
        return fsa.fused_gat_table_autocap(
            hh, aa, ss, dd, sd, rc, od, er, None, n, nh, f, 1e-8, slope,
            256, 128, True)

    def oracle(hh, aa, ss, dd):
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

    an = (0, 1, 2) + ((3,) if with_dropout else ())

    def lt(*a):
        o = auto(*a)
        return jnp.sum(jnp.sin(o)), o

    def lr(*a):
        o = oracle(*a)
        return jnp.sum(jnp.sin(o)), o

    (_, ot), gt = jax.value_and_grad(lt, argnums=an, has_aux=True)(
        h, a_src, s_dst, drop)
    (_, orr), gr = jax.value_and_grad(lr, argnums=an, has_aux=True)(
        h, a_src, s_dst, drop)
    np.testing.assert_allclose(np.asarray(ot), np.asarray(orr),
                               rtol=1e-5, atol=1e-5)
    for a, b, nm in zip(gt, gr, ("h", "a_src", "s_dst", "drop")):
        scale = max(float(np.abs(np.asarray(b)).max()), 1.0)
        np.testing.assert_allclose(np.asarray(a) / scale,
                                   np.asarray(b) / scale,
                                   rtol=0, atol=2e-5, err_msg=nm)


def test_partial_kernel_matches_full():
    num_nodes, num_edges, nh, f = 256, 1500, 2, 8
    logits, h_src, recv = make_edges(num_nodes, num_edges, nh, f, seed=9)
    num, denom = fsa.fused_segment_attention_partial(
        logits, h_src, recv, None, num_nodes, nh, f, 256, 128, True)
    inv = jnp.where(denom > 0, 1.0 / (denom + 1e-8), 0.0)
    got = (num.reshape(num_nodes, nh, f) * inv[:, :, None]
           ).reshape(num_nodes, nh * f)
    want = fsa.fused_segment_attention(logits, h_src, recv, None,
                                       num_nodes, nh, f, 1e-8, 256, 128,
                                       True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_partial_kernel_vjp():
    num_nodes, num_edges, nh, f = 128, 700, 2, 8
    logits, h_src, recv = make_edges(num_nodes, num_edges, nh, f, seed=10)

    def loss_p(lg, hs):
        num, denom = fsa.fused_segment_attention_partial(
            lg, hs, recv, None, num_nodes, nh, f, 256, 128, True)
        inv = jnp.where(denom > 0, 1.0 / (denom + 1e-8), 0.0)
        out = (num.reshape(num_nodes, nh, f) * inv[:, :, None])
        return jnp.sum(jnp.sin(out))

    def loss_r(lg, hs):
        out = fsa.reference_segment_attention(lg, hs, recv, None,
                                              num_nodes, nh, f)
        return jnp.sum(jnp.sin(out.reshape(num_nodes, nh, f)))

    gp = jax.grad(loss_p, argnums=(0, 1))(logits, h_src)
    gr = jax.grad(loss_r, argnums=(0, 1))(logits, h_src)
    for a, b in zip(gp, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=5e-5)


def test_sharded_layer_fused_matches_xla():
    """shard_map edge-partitioned layer with backend=pallas (partial
    kernel + psum) == unsharded XLA layer. check_vma=False here because
    interpret mode inlines the kernel jaxpr, which the varying-axes
    checker cannot type (compiled TPU tracing disables it internally —
    see segment_attention._forward docstring); forward-only parity."""
    from jax.sharding import PartitionSpec as P
    from gat_pytorch_tpu import parallel

    mesh = parallel.make_mesh(data=2, edge=4)
    graph = _tiny_graph(seed=21, num_nodes=120)
    cfg = gat.GATLayerConfig(in_features=12, out_features=8, num_heads=2,
                             concat=True)
    params = gat.init_gat_layer(jax.random.key(2), cfg)

    def body(p, x, s, r, em):
        return gat.gat_layer_apply(p, cfg, x, s, r, em, graph.num_nodes,
                                   edge_axis="edge", backend="pallas")

    out_sharded = jax.jit(jax.shard_map(
        body, mesh=mesh,
        in_specs=(P(), P(), P("edge"),
                  P("edge"), P("edge")),
        out_specs=P(), check_vma=False))(
        params, graph.x, graph.senders, graph.receivers, graph.edge_mask)

    out_ref = gat.gat_layer_apply(params, cfg, graph.x, graph.senders,
                                  graph.receivers, graph.edge_mask,
                                  graph.num_nodes, backend="xla")
    np.testing.assert_allclose(np.asarray(out_sharded), np.asarray(out_ref),
                               rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("dropout", [0.0, 0.3])
def test_sharded_train_step_pallas_vs_xla_backward(dropout):
    """Backward-INCLUSIVE sharded parity (VERDICT r1 weak #2): the full
    edge-partitioned train step — fused partial kernel forward, fused
    partial backward, psum completion, loss, value_and_grad — with
    backend="pallas" must match backend="xla" under identical shard_map
    machinery (interpret mode on CPU; check_vma=False because interpret
    inlines the kernel jaxpr, so BOTH sides run the same unchecked
    semantics and grads of replicated params are compared as-is)."""
    from jax.sharding import PartitionSpec as P
    from gat_pytorch_tpu import parallel

    mesh = parallel.make_mesh(data=1, edge=8)
    graph = _tiny_graph(seed=31, num_nodes=96)
    cfg = gat.GATConfig(
        num_input_node_features=12, num_layers=2,
        num_heads_per_layer=[2, 2], heads_concat_per_layer=[True, False],
        head_output_features_per_layer=[12, 8, 4], num_classes=4,
        add_skip_connection=[False, True], dropout=dropout)
    params = gat.init_gat_model(jax.random.key(7), cfg)
    rng = jax.random.key(11)

    def make_step(backend):
        def body(p, x, s, r, em, so):
            g = graph.replace(x=x, senders=s, receivers=r, edge_mask=em,
                              src_order=so)

            def loss(p):
                out = gat.gat_model_apply(
                    p, cfg, g, rng=rng, training=dropout > 0.0,
                    edge_axis="edge", backend=backend)
                return jnp.mean(out ** 2)

            return jax.value_and_grad(loss)(p)

        return jax.jit(jax.shard_map(
            body, mesh=mesh,
            in_specs=(P(), P(), P("edge"), P("edge"), P("edge"),
                      P("edge")),
            out_specs=P(), check_vma=False))

    args = (params, graph.x, graph.senders, graph.receivers,
            graph.edge_mask, graph.src_order)
    loss_p, grads_p = make_step("pallas")(*args)
    loss_x, grads_x = make_step("xla")(*args)
    np.testing.assert_allclose(float(loss_p), float(loss_x), rtol=1e-5)
    for (path, a), (_, b) in zip(
            jax.tree_util.tree_leaves_with_path(grads_p),
            jax.tree_util.tree_leaves_with_path(grads_x)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5,
            err_msg=f"grad mismatch at {jax.tree_util.keystr(path)}")


@pytest.mark.parametrize("num_segments,e,d", [
    (128, 700, 16), (384, 3000, 7), (256, 50, 64),
])
def test_segment_sum_pallas_matches_xla(num_segments, e, d):
    from gat_pytorch_tpu.ops.pallas.segment_sum import segment_sum_pallas
    rng = np.random.default_rng(0)
    ids = np.sort(rng.integers(0, num_segments, e)).astype(np.int32)
    vals = rng.normal(size=(e, d)).astype(np.float32)
    got = segment_sum_pallas(jnp.asarray(vals), jnp.asarray(ids),
                             num_segments, interpret=True)
    want = jax.ops.segment_sum(jnp.asarray(vals), jnp.asarray(ids),
                               num_segments=num_segments,
                               indices_are_sorted=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_gather_src_sorted_vjp_matches_take():
    from gat_pytorch_tpu.ops.pallas.gather import gather_rows_src_sorted
    rng = np.random.default_rng(0)
    n, e, d = 200, 900, 16
    table = jnp.asarray(rng.normal(size=(n, d)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, n, e).astype(np.int32))
    order = jnp.asarray(np.argsort(np.asarray(idx), kind="stable")
                        .astype(np.int32))

    def loss_a(t):
        return jnp.sum(jnp.sin(
            gather_rows_src_sorted(t, idx, order, n, True)))

    def loss_b(t):
        return jnp.sum(jnp.sin(jnp.take(t, idx, axis=0)))

    va, ga = jax.value_and_grad(loss_a)(table)
    vb, gb = jax.value_and_grad(loss_b)(table)
    np.testing.assert_allclose(float(va), float(vb), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(ga), np.asarray(gb),
                               rtol=1e-5, atol=1e-5)


def test_xla_bwd_fallback_matches_fused(monkeypatch):
    num_nodes, num_edges, nh, f = 256, 1200, 2, 8
    logits, h_src, recv = make_edges(num_nodes, num_edges, nh, f, seed=12)

    def loss(lg, hs):
        out = fsa.fused_segment_attention(lg, hs, recv, None,
                                          num_nodes, nh, f, 1e-8, 256, 128,
                                          True)
        return jnp.sum(out ** 2)

    g_fused = jax.grad(loss, argnums=(0, 1))(logits, h_src)
    monkeypatch.setenv("GAT_TPU_FUSED_BWD", "0")
    jax.clear_caches()
    g_xla = jax.grad(loss, argnums=(0, 1))(logits, h_src)
    for a, b in zip(g_fused, g_xla):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_v5_autocap_score_bound_invariance():
    """v10 single-sweep (v5 family): out is algebraically invariant to
    the score_bound B — the epilogue divides the B-scaling back out,
    eps term included (segment_attention._fgta_fwd)."""
    rng = np.random.default_rng(9)
    n, e_real, pad, nh, f = 256, 1500, 36, 4, 16
    e = e_real + pad
    recv = np.concatenate([np.sort(rng.integers(0, n, e_real)),
                           np.full(pad, n - 1)]).astype(np.int32)
    send = np.concatenate([rng.integers(0, n, e_real),
                           np.full(pad, n - 1)]).astype(np.int32)
    order = np.argsort(send, kind="stable").astype(np.int32)
    h = jnp.asarray(rng.normal(size=(n, nh * f)).astype(np.float32))
    a_src = jnp.asarray((rng.normal(size=(nh * f, nh))
                         / np.sqrt(nh * f)).astype(np.float32))
    s_dst = jnp.asarray(rng.normal(size=(n, nh)).astype(np.float32))
    sd, rc, od = map(jnp.asarray, (send, recv, order))
    er = jnp.int32(e_real)

    def run(bound):
        return fsa.fused_gat_table_autocap(
            h, a_src, s_dst, None, sd, rc, od, er, bound, n, nh, f,
            1e-8, 0.01, 256, 128, True)

    o_auto = np.asarray(run(None))
    tight = float(np.max(np.asarray(h) @ np.asarray(a_src))
                  + np.max(np.asarray(s_dst)))
    for bound in (tight, tight + 5.0, tight + 200.0):
        np.testing.assert_allclose(np.asarray(run(jnp.float32(bound))),
                                   o_auto, rtol=2e-5, atol=2e-6,
                                   err_msg=f"bound={bound}")
