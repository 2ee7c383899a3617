"""GAT layer/model parity vs the numpy oracle (tests/reference_math.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gat_pytorch_tpu.data.synthetic import make_random_graph
from gat_pytorch_tpu.graph import transforms as T
from gat_pytorch_tpu.models import gat
from tests import reference_math as ref


def _setup(seed=0, n=80, deg=4.0, f_in=16, nh=4, f_out=8):
    g = make_random_graph(seed, n, deg, f_in)
    # oracle operates on unpadded, self-looped, dst-sorted edges
    s, r = T.add_remaining_self_loops(g.senders, g.receivers, n)
    s, r = T.sort_by_destination(s, r)
    graph = T.canonicalize(g.x, g.senders, g.receivers, y=g.y)
    rng = np.random.default_rng(seed + 99)
    W_t = rng.standard_normal((nh * f_out, f_in)).astype(np.float32) * 0.2
    a_t = rng.standard_normal((nh, nh * 2 * f_out)).astype(np.float32) * 0.2
    return g, s, r, graph, W_t, a_t


@pytest.mark.parametrize("concat", [True, False])
def test_layer_matches_oracle_reference_mode(concat):
    n, f_in, nh, f_out = 80, 16, 4, 8
    g, s, r, graph, W_t, a_t = _setup(concat, n=n, f_in=f_in, nh=nh,
                                      f_out=f_out)
    want, want_alpha = ref.ref_gat_layer(
        g.x, s, r, W_t, a_t, num_heads=nh, out_features=f_out, concat=concat)

    cfg = gat.GATLayerConfig(in_features=f_in, out_features=f_out,
                             num_heads=nh, concat=concat)
    params = {"W": jnp.asarray(W_t.T), "a": jnp.asarray(a_t.T)}
    got, alpha = gat.gat_layer_apply(
        params, cfg, graph.x, graph.senders, graph.receivers,
        graph.edge_mask, graph.num_nodes, return_attention=True)

    np.testing.assert_allclose(np.asarray(got)[:n], want,
                               rtol=2e-4, atol=2e-5)
    # attention coeffs compare as multisets per (dst, head): our edge order
    # is the same dst-sorted order as the oracle's
    np.testing.assert_allclose(np.asarray(alpha)[:len(s)], want_alpha,
                               rtol=2e-4, atol=2e-6)


def test_layer_matches_oracle_paper_faithful():
    n, f_in, nh, f_out = 60, 12, 3, 8
    g = make_random_graph(7, n, 5.0, f_in)
    s, r = T.add_remaining_self_loops(g.senders, g.receivers, n)
    s, r = T.sort_by_destination(s, r)
    graph = T.canonicalize(g.x, g.senders, g.receivers)
    rng = np.random.default_rng(3)
    W_t = rng.standard_normal((nh * f_out, f_in)).astype(np.float32) * 0.3
    a = rng.standard_normal((nh, 2 * f_out)).astype(np.float32) * 0.3
    want, _ = ref.ref_gat_layer(g.x, s, r, W_t, a, num_heads=nh,
                                out_features=f_out, concat=True,
                                paper_faithful=True)
    cfg = gat.GATLayerConfig(in_features=f_in, out_features=f_out,
                             num_heads=nh, concat=True, paper_faithful=True)
    params = {"W": jnp.asarray(W_t.T), "a": jnp.asarray(a)}
    got = gat.gat_layer_apply(params, cfg, graph.x, graph.senders,
                              graph.receivers, graph.edge_mask,
                              graph.num_nodes)
    np.testing.assert_allclose(np.asarray(got)[:n], want, rtol=2e-4,
                               atol=2e-5)


def test_const_attention_is_uniform():
    n = 40
    g = make_random_graph(5, n, 4.0, 8)
    graph = T.canonicalize(g.x, g.senders, g.receivers)
    cfg = gat.GATLayerConfig(in_features=8, out_features=4, num_heads=2,
                             concat=True, const_attention=True)
    params = gat.init_gat_layer(jax.random.key(0), cfg)
    assert "a" not in params
    _, alpha = gat.gat_layer_apply(
        params, cfg, graph.x, graph.senders, graph.receivers,
        graph.edge_mask, graph.num_nodes, return_attention=True)
    # every real edge's alpha == 1/deg(dst)
    a = np.asarray(alpha)
    recv = np.asarray(graph.receivers)
    emask = np.asarray(graph.edge_mask)
    deg = np.bincount(recv[emask], minlength=graph.num_nodes)
    want = np.broadcast_to(1.0 / (deg[recv[emask]][:, None] + 1e-8),
                           a[emask].shape)
    np.testing.assert_allclose(a[emask], want, rtol=1e-5)


def test_model_stack_matches_oracle_with_skips():
    """2-layer stack with a projected skip on layer 0 and identity-mean skip
    semantics on layer 1 (mean head combine)."""
    n, f_in = 50, 10
    g = make_random_graph(11, n, 4.0, f_in)
    s, r = T.add_remaining_self_loops(g.senders, g.receivers, n)
    s, r = T.sort_by_destination(s, r)
    graph = T.canonicalize(g.x, g.senders, g.receivers)

    cfg = gat.GATConfig(
        num_input_node_features=f_in, num_layers=2,
        num_heads_per_layer=[4, 2], heads_concat_per_layer=[True, False],
        head_output_features_per_layer=[f_in, 6, 5], num_classes=5,
        add_skip_connection=[True, True], dropout=0.0)
    params = gat.init_gat_model(jax.random.key(0), cfg)

    lp = []
    for i, lc in enumerate(cfg.layer_configs()):
        lp.append({"W": np.asarray(params["layers"][i]["W"]).T,
                   "a": np.asarray(params["layers"][i]["a"]).T})
    lcfgs = [dict(num_heads=lc.num_heads, out_features=lc.out_features,
                  concat=lc.concat) for lc in cfg.layer_configs()]
    sp = [None if "w" not in p else np.asarray(p["w"]).T
          for p in params["skips"]]
    want, want_att = ref.ref_gat_model(
        g.x, s, r, lp, lcfgs, sp, [True, True], [True, False],
        heads=[1, 4, 2], feats=[f_in, 6, 5])

    got, att = gat.gat_model_apply(params, cfg, graph,
                                   return_attention=True)
    np.testing.assert_allclose(np.asarray(got)[:n], want, rtol=3e-4,
                               atol=3e-5)
    assert len(att) == 2


def test_v5_model_path_matches_default(monkeypatch):
    """GAT_TPU_V5=1 routes gat_layer_apply through the v5 whole-fusion
    branch (fused_gat_table, interpret on CPU); the full 2-layer model
    output must match the default XLA path. Also pins the gate: =0 (and
    auto below 200k edges) must NOT change the default result."""
    n, f_in = 60, 12
    g = make_random_graph(17, n, 4.0, f_in)
    graph = T.canonicalize(g.x, g.senders, g.receivers)
    cfg = gat.GATConfig(
        num_input_node_features=f_in, num_layers=2,
        num_heads_per_layer=[4, 1], heads_concat_per_layer=[True, False],
        head_output_features_per_layer=[f_in, 8, 5], num_classes=5,
        add_skip_connection=[False, False], dropout=0.0)
    params = gat.init_gat_model(jax.random.key(2), cfg)

    base = gat.gat_model_apply(params, cfg, graph)
    monkeypatch.setenv("GAT_TPU_V5", "1")
    monkeypatch.setenv("GAT_TPU_BACKEND", "pallas")
    v5 = gat.gat_model_apply(params, cfg, graph)
    np.testing.assert_allclose(np.asarray(v5), np.asarray(base),
                               rtol=1e-5, atol=1e-5)
    monkeypatch.setenv("GAT_TPU_V5", "0")
    off = gat.gat_model_apply(params, cfg, graph)
    np.testing.assert_allclose(np.asarray(off), np.asarray(base),
                               rtol=1e-6, atol=1e-6)


def test_attention_norm_matches_manual():
    n = 30
    g = make_random_graph(13, n, 3.0, 6)
    graph = T.canonicalize(g.x, g.senders, g.receivers)
    cfg = gat.GATConfig(
        num_input_node_features=6, num_layers=1, num_heads_per_layer=[2],
        heads_concat_per_layer=[True], head_output_features_per_layer=[6, 4],
        num_classes=8, add_skip_connection=[False], dropout=0.0)
    params = gat.init_gat_model(jax.random.key(1), cfg)
    _, att = gat.gat_model_apply(params, cfg, graph, return_attention=True)
    norm = gat.calc_attention_norm(graph, att)

    a = np.asarray(att[0])
    recv = np.asarray(graph.receivers)
    emask = np.asarray(graph.edge_mask)
    deg = np.bincount(recv[emask], minlength=graph.num_nodes).astype(float)
    want = np.abs(a[emask] * deg[recv[emask]][:, None] - 1.0).sum() / \
        emask.sum()
    np.testing.assert_allclose(float(norm), want, rtol=1e-5)


def test_permutation_invariance():
    """Node relabelling permutes outputs correspondingly (property test)."""
    n, f_in = 40, 8
    g = make_random_graph(17, n, 4.0, f_in)
    cfg = gat.GATLayerConfig(in_features=f_in, out_features=4, num_heads=2,
                             concat=True)
    params = gat.init_gat_layer(jax.random.key(2), cfg)

    def run(x, s, r):
        graph = T.canonicalize(x, s, r)
        return np.asarray(gat.gat_layer_apply(
            params, cfg, graph.x, graph.senders, graph.receivers,
            graph.edge_mask, graph.num_nodes))[:n]

    out1 = run(g.x, g.senders, g.receivers)
    perm = np.random.default_rng(0).permutation(n)
    inv = np.argsort(perm)
    out2 = run(g.x[perm], inv[g.senders], inv[g.receivers])
    np.testing.assert_allclose(out2, out1[perm], rtol=2e-4, atol=1e-5)


def test_dropout_active_only_in_training():
    n = 30
    g = make_random_graph(23, n, 4.0, 8)
    graph = T.canonicalize(g.x, g.senders, g.receivers)
    cfg = gat.GATConfig(
        num_input_node_features=8, num_layers=1, num_heads_per_layer=[2],
        heads_concat_per_layer=[True], head_output_features_per_layer=[8, 4],
        num_classes=8, add_skip_connection=[False], dropout=0.5)
    params = gat.init_gat_model(jax.random.key(3), cfg)
    eval_out = gat.gat_model_apply(params, cfg, graph, training=False)
    eval_out2 = gat.gat_model_apply(params, cfg, graph, training=False)
    np.testing.assert_array_equal(np.asarray(eval_out), np.asarray(eval_out2))
    tr1 = gat.gat_model_apply(params, cfg, graph, training=True,
                              rng=jax.random.key(0))
    tr2 = gat.gat_model_apply(params, cfg, graph, training=True,
                              rng=jax.random.key(1))
    assert not np.allclose(np.asarray(tr1), np.asarray(tr2))


def test_gatconfig_validation_messages():
    import pytest as _pytest
    from gat_pytorch_tpu.models.gat import GATConfig

    good = dict(num_input_node_features=8, num_layers=2,
                num_heads_per_layer=[2, 1],
                heads_concat_per_layer=[True, False],
                head_output_features_per_layer=[8, 4, 3], num_classes=3,
                add_skip_connection=[False, False])
    GATConfig(**good).validate()

    bad = dict(good, num_heads_per_layer=[2])
    with _pytest.raises(ValueError, match="num_heads_per_layer"):
        GATConfig(**bad).validate()
    bad = dict(good, num_classes=7)
    with _pytest.raises(ValueError, match="num_classes=7"):
        GATConfig(**bad).validate()
    bad = dict(good, head_output_features_per_layer=[9, 4, 3])
    with _pytest.raises(ValueError, match="num_input_node_features"):
        GATConfig(**bad).validate()


def test_naive_runtime_oracle_matches_custom():
    """backend='naive' (models/naive.py — the runtime A/B oracle, the
    reference's layer_type=GATConv switch) must match the optimised
    implementation on the full model, both quirk modes."""
    import numpy as np
    from gat_pytorch_tpu.graph import transforms as T

    rng = np.random.default_rng(40)
    n = 80
    senders = np.repeat(np.arange(n), 4)
    receivers = rng.integers(0, n, n * 4)
    x = rng.normal(size=(n, 10)).astype(np.float32)
    graph = T.canonicalize(x, senders, receivers)
    for pf in (False, True):
        cfg = gat.GATConfig(
            num_input_node_features=10, num_layers=2,
            num_heads_per_layer=[2, 1],
            heads_concat_per_layer=[True, False],
            head_output_features_per_layer=[10, 8, 3], num_classes=3,
            add_skip_connection=[False, True], dropout=0.0,
            paper_faithful=pf)
        params = gat.init_gat_model(jax.random.key(7), cfg)
        out_c = gat.gat_model_apply(params, cfg, graph, backend="xla")
        out_n = gat.gat_model_apply(params, cfg, graph, backend="naive")
        np.testing.assert_allclose(np.asarray(out_n), np.asarray(out_c),
                                   rtol=1e-5, atol=1e-5)

def test_v6_model_path_matches_default(monkeypatch):
    """GAT_TPU_V6=1 routes gat_layer_apply through the windowed-gather
    kernel (whole-table-resident mode on a plain graph, true windowed
    mode on an RCM graph with src_windows metadata); the 2-layer model
    output AND a parameter gradient must match the default XLA path."""
    n, f_in = 150, 12
    g = make_random_graph(23, n, 5.0, f_in)
    cfg = gat.GATConfig(
        num_input_node_features=f_in, num_layers=2,
        num_heads_per_layer=[4, 1], heads_concat_per_layer=[True, False],
        head_output_features_per_layer=[f_in, 8, 5], num_classes=5,
        add_skip_connection=[False, False], dropout=0.0)
    params = gat.init_gat_model(jax.random.key(2), cfg)

    for kw in [dict(), dict(reorder="rcm", src_windows=True)]:
        graph = T.canonicalize(g.x, g.senders, g.receivers, **kw)

        def loss(p, graph=graph):
            return jnp.sum(jnp.sin(gat.gat_model_apply(p, cfg, graph)))

        monkeypatch.delenv("GAT_TPU_V6", raising=False)
        monkeypatch.delenv("GAT_TPU_BACKEND", raising=False)
        base, gbase = jax.value_and_grad(loss)(params)
        monkeypatch.setenv("GAT_TPU_V6", "1")
        monkeypatch.setenv("GAT_TPU_V6_DTYPE", "float32")
        monkeypatch.setenv("GAT_TPU_BACKEND", "pallas")
        v6, gv6 = jax.value_and_grad(loss)(params)
        np.testing.assert_allclose(float(v6), float(base),
                                   rtol=1e-5, atol=1e-5)
        for a, b in zip(jax.tree_util.tree_leaves(gv6),
                        jax.tree_util.tree_leaves(gbase)):
            scale = max(float(np.abs(np.asarray(b)).max()), 1.0)
            np.testing.assert_allclose(np.asarray(a) / scale,
                                       np.asarray(b) / scale,
                                       rtol=0, atol=3e-5)
        monkeypatch.delenv("GAT_TPU_V6", raising=False)
        monkeypatch.delenv("GAT_TPU_BACKEND", raising=False)


def test_v6_auto_gate_requires_banded_window(monkeypatch):
    """v6 auto mode only engages for banded-certified narrow windows:
    whole-table-resident v6 measured -44% on the full Cora train step
    (docs/PERF.md round 3), so GAT_TPU_V6=auto must NOT route a plain
    (uncertified) graph through fused_gat_window even with the pallas
    backend, while GAT_TPU_V6=1 still forces it."""
    from gat_pytorch_tpu.ops.pallas import segment_attention_window as fsw

    n, f_in = 600, 6
    g = make_random_graph(11, n, 8.0, f_in)  # > 4096 edges after loops
    cfg = gat.GATConfig(
        num_input_node_features=f_in, num_layers=1,
        num_heads_per_layer=[2], heads_concat_per_layer=[False],
        head_output_features_per_layer=[f_in, 4], num_classes=4,
        add_skip_connection=[False], dropout=0.0)
    params = gat.init_gat_model(jax.random.key(0), cfg)
    graph = T.canonicalize(g.x, g.senders, g.receivers)
    assert int(np.asarray(graph.edge_mask).sum()) >= 4096

    calls = []
    orig = fsw.fused_gat_window

    def spy(*a, **k):
        calls.append(1)
        return orig(*a, **k)

    monkeypatch.setattr(fsw, "fused_gat_window", spy)
    monkeypatch.setenv("GAT_TPU_BACKEND", "pallas")
    monkeypatch.setenv("GAT_TPU_V6_DTYPE", "float32")

    monkeypatch.setenv("GAT_TPU_V6", "auto")
    gat.gat_model_apply(params, cfg, graph)
    assert not calls, "auto mode must not take v6 without tile_lo"

    monkeypatch.setenv("GAT_TPU_V6", "1")
    gat.gat_model_apply(params, cfg, graph)
    assert calls, "GAT_TPU_V6=1 must force the v6 path"


@pytest.mark.parametrize("paper_faithful", [False, True])
def test_fused_return_attention_parity(paper_faithful):
    """return_attention no longer falls back to plain XLA on the pallas
    backend (VERDICT r3 item 5): the v4 table kernel owns the
    aggregation while alpha is recomputed with XLA segment ops from the
    same logits. Values AND gradients of an attention-regularised loss
    (lambda=1.0, the reference's ppi_gat.py:25-32 sweep) must match the
    XLA path — alpha(logits) appearing twice is gradient-exact."""
    n, f_in = 60, 12
    g = make_random_graph(21, n, 5.0, f_in)
    graph = T.canonicalize(g.x, g.senders, g.receivers)
    cfg = gat.GATConfig(
        num_input_node_features=f_in, num_layers=2,
        num_heads_per_layer=[4, 1], heads_concat_per_layer=[True, False],
        head_output_features_per_layer=[f_in, 8, 5], num_classes=5,
        add_skip_connection=[False, True], dropout=0.0,
        paper_faithful=paper_faithful)
    params = gat.init_gat_model(jax.random.key(2), cfg)
    nmask = np.asarray(graph.node_mask)

    def loss(p, backend):
        out, att = gat.gat_model_apply(p, cfg, graph, backend=backend,
                                       return_attention=True)
        norm = gat.calc_attention_norm(graph, att)
        return jnp.sum(out[nmask] ** 2) * 1e-3 + 1.0 * norm

    (l_x, g_x) = jax.value_and_grad(loss)(params, "xla")
    (l_p, g_p) = jax.value_and_grad(loss)(params, "pallas")
    np.testing.assert_allclose(float(l_p), float(l_x), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(g_x),
                    jax.tree_util.tree_leaves(g_p)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=2e-4, atol=1e-6)


def test_fused_return_attention_wide_heads_block_sizes(monkeypatch):
    """PPI's wide heads (nhfl=1024) through the fused return_attention
    path must use the narrow (256, 128) kernel blocks — the hardcoded
    (1024, 256) measured a 16.65 MB scoped-VMEM compile OOM on-chip
    (round-4 lambda-path regression)."""
    from gat_pytorch_tpu.ops.pallas import segment_attention as fsa

    n, f_in, nh, f = 60, 16, 4, 256
    g = make_random_graph(31, n, 4.0, f_in)
    graph = T.canonicalize(g.x, g.senders, g.receivers)
    cfg = gat.GATConfig(
        num_input_node_features=f_in, num_layers=1,
        num_heads_per_layer=[nh], heads_concat_per_layer=[True],
        head_output_features_per_layer=[f_in, f], num_classes=nh * f,
        add_skip_connection=[False], dropout=0.0)
    params = gat.init_gat_model(jax.random.key(6), cfg)

    seen = []
    orig = fsa.fused_segment_attention_table

    def spy(*a, **k):
        seen.append((a[10], a[11]))   # (eb, nb) positional args
        return orig(*a, **k)

    monkeypatch.setattr(fsa, "fused_segment_attention_table", spy)
    import gat_pytorch_tpu.models.gat as gatmod
    monkeypatch.setattr(gatmod.fsa, "fused_segment_attention_table", spy)
    out, att = gat.gat_model_apply(params, cfg, graph, backend="pallas",
                                   return_attention=True)
    assert seen and all(s == (256, 128) for s in seen), seen
    want, _ = gat.gat_model_apply(params, cfg, graph, backend="xla",
                                  return_attention=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want),
                               rtol=2e-4, atol=2e-5)


@pytest.mark.parametrize("layout_kw", [
    dict(),                                    # resident-table v6 mode
    dict(reorder="rcm", src_windows=True),     # v7 block-local windows
])
def test_windowed_return_attention_parity(monkeypatch, layout_kw):
    """Round 5 (VERDICT r4 missing item 1): return_attention no longer
    excludes the windowed v6/v7 family — the kernel keeps the feature
    aggregation and alpha comes from the XLA score-table replica.
    Values AND gradients of a lambda=1.0 regularised loss must match
    the XLA path on both the resident-table and the v7 layouts."""
    n, f_in = 150, 12
    g = make_random_graph(24, n, 5.0, f_in)
    graph = T.canonicalize(g.x, g.senders, g.receivers, **layout_kw)
    cfg = gat.GATConfig(
        num_input_node_features=f_in, num_layers=2,
        num_heads_per_layer=[4, 1], heads_concat_per_layer=[True, False],
        head_output_features_per_layer=[f_in, 8, 5], num_classes=5,
        add_skip_connection=[False, True], dropout=0.0)
    params = gat.init_gat_model(jax.random.key(3), cfg)
    nmask = np.asarray(graph.node_mask)
    monkeypatch.setenv("GAT_TPU_V6_DTYPE", "float32")

    def loss(p, backend, fw=None):
        out, att = gat.gat_model_apply(p, cfg, graph, backend=backend,
                                       return_attention=True,
                                       force_windowed=fw)
        norm = gat.calc_attention_norm(graph, att)
        return jnp.sum(out[nmask] ** 2) * 1e-3 + 1.0 * norm

    l_x, g_x = jax.value_and_grad(loss)(params, "xla")
    gat.PATH_TRACE.clear()
    l_p, g_p = jax.value_and_grad(loss)(params, "pallas", True)
    assert any(t.startswith(("v6", "v7")) for t in gat.PATH_TRACE), \
        gat.PATH_TRACE
    np.testing.assert_allclose(float(l_p), float(l_x), rtol=1e-5)
    for (path, a), (_, b) in zip(
            jax.tree_util.tree_leaves_with_path(g_x),
            jax.tree_util.tree_leaves_with_path(g_p)):
        scale = max(float(np.abs(np.asarray(a)).max()), 1e-3)
        np.testing.assert_allclose(
            np.asarray(b) / scale, np.asarray(a) / scale, rtol=0,
            atol=5e-5, err_msg=jax.tree_util.keystr(path))


def test_v5_return_attention_parity(monkeypatch):
    """Same contract for the v5 whole-fusion table kernel (forced on at
    small size with GAT_TPU_V5=1, windowed family off)."""
    n, f_in = 150, 12
    g = make_random_graph(25, n, 5.0, f_in)
    graph = T.canonicalize(g.x, g.senders, g.receivers)
    cfg = gat.GATConfig(
        num_input_node_features=f_in, num_layers=2,
        num_heads_per_layer=[4, 1], heads_concat_per_layer=[True, False],
        head_output_features_per_layer=[f_in, 8, 5], num_classes=5,
        add_skip_connection=[False, False], dropout=0.0)
    params = gat.init_gat_model(jax.random.key(4), cfg)
    nmask = np.asarray(graph.node_mask)

    def loss(p, backend):
        out, att = gat.gat_model_apply(p, cfg, graph, backend=backend,
                                       return_attention=True)
        norm = gat.calc_attention_norm(graph, att)
        return jnp.sum(out[nmask] ** 2) * 1e-3 + 1.0 * norm

    l_x, g_x = jax.value_and_grad(loss)(params, "xla")
    monkeypatch.setenv("GAT_TPU_V5", "1")
    monkeypatch.setenv("GAT_TPU_V6", "0")
    gat.PATH_TRACE.clear()
    l_p, g_p = jax.value_and_grad(loss)(params, "pallas")
    assert "v5" in gat.PATH_TRACE, gat.PATH_TRACE
    np.testing.assert_allclose(float(l_p), float(l_x), rtol=1e-5)
    for (path, a), (_, b) in zip(
            jax.tree_util.tree_leaves_with_path(g_x),
            jax.tree_util.tree_leaves_with_path(g_p)):
        scale = max(float(np.abs(np.asarray(a)).max()), 1e-3)
        np.testing.assert_allclose(
            np.asarray(b) / scale, np.asarray(a) / scale, rtol=0,
            atol=5e-5, err_msg=jax.tree_util.keystr(path))


def test_hybrid_return_attention_parity(monkeypatch):
    """The single-device HYBRID branch (v7 windows + v5 remainder) with
    return_attention: kernel aggregation + alpha replica must match the
    XLA path (values and lambda=1.0 gradients)."""
    rng = np.random.default_rng(77)
    n, comm, deg = 192, 6, 5
    e = n * deg
    labels = rng.integers(0, comm, n)
    members = [np.where(labels == c)[0] for c in range(comm)]
    s = rng.integers(0, n, e)
    r = np.empty(e, np.int64)
    same = rng.random(e) < 0.9
    r[~same] = rng.integers(0, n, int((~same).sum()))
    for c in range(comm):
        pick = same & (labels[s] == c)
        r[pick] = members[c][rng.integers(0, len(members[c]),
                                          int(pick.sum()))]
    x = rng.normal(size=(n, 12)).astype(np.float32)
    # cap the hybrid window below the node range so a remainder exists
    # at this tiny size (production graphs get it from scale)
    monkeypatch.setenv("GAT_TPU_HYBRID_MAX_W", "128")
    graph = T.canonicalize(x, s, r, reorder="cluster", src_windows=True,
                           hybrid=True)
    bl = graph.block_layout
    assert bl.rem_send is not None and bl.rem_e > 0, \
        "hybrid layout must carry a remainder for this test"

    cfg = gat.GATConfig(
        num_input_node_features=12, num_layers=2,
        num_heads_per_layer=[4, 1], heads_concat_per_layer=[True, False],
        head_output_features_per_layer=[12, 8, 5], num_classes=5,
        add_skip_connection=[False, False], dropout=0.0)
    params = gat.init_gat_model(jax.random.key(7), cfg)
    nmask = np.asarray(graph.node_mask)
    monkeypatch.setenv("GAT_TPU_V6_DTYPE", "float32")

    def loss(p, backend, fw=None):
        out, att = gat.gat_model_apply(p, cfg, graph, backend=backend,
                                       return_attention=True,
                                       force_windowed=fw)
        norm = gat.calc_attention_norm(graph, att)
        return jnp.sum(out[nmask] ** 2) * 1e-3 + 1.0 * norm

    l_x, g_x = jax.value_and_grad(loss)(params, "xla")
    gat.PATH_TRACE.clear()
    l_p, g_p = jax.value_and_grad(loss)(params, "pallas", True)
    assert "v7_hybrid" in gat.PATH_TRACE, gat.PATH_TRACE
    np.testing.assert_allclose(float(l_p), float(l_x), rtol=1e-5)
    for (path, a), (_, b) in zip(
            jax.tree_util.tree_leaves_with_path(g_x),
            jax.tree_util.tree_leaves_with_path(g_p)):
        scale = max(float(np.abs(np.asarray(a)).max()), 1e-3)
        np.testing.assert_allclose(
            np.asarray(b) / scale, np.asarray(a) / scale, rtol=0,
            atol=5e-5, err_msg=jax.tree_util.keystr(path))
