"""Hybrid split-locality layout (VERDICT r3 item 3): cluster ordering
(capped label propagation) + per-dst-tile best-coverage windows route
most edges through the v7 windowed kernel and the remainder through the
v5 table kernel, with their UNNORMALISED v10 single-sweep parts summed
in one epilogue (models/gat.py hybrid branch). Exactness rests on
num/den additivity over any edge partition."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gat_pytorch_tpu.graph import transforms as T
from gat_pytorch_tpu.models import gat


def make_clustered_graph(seed=0, n=900, communities=3, deg=5,
                         homophily=0.9, f_in=12):
    """Small SBM — the Pubmed stand-in's structure (data/synthetic.py)."""
    rng = np.random.default_rng(seed)
    labels = rng.integers(0, communities, n)
    src = rng.integers(0, n, n * deg)
    partner = rng.integers(0, n, n * deg)
    same = rng.random(n * deg) < homophily
    for c in range(communities):
        members = np.where(labels == c)[0]
        pick = same & (labels[src] == c)
        partner[pick] = members[rng.integers(0, len(members), pick.sum())]
    keep = src != partner
    s, r = src[keep], partner[keep]
    x = rng.normal(size=(n, f_in)).astype(np.float32)
    return x, s, r


def tiny_cfg(f_in=12, dropout=0.0):
    return gat.GATConfig(
        num_input_node_features=f_in, num_layers=2,
        num_heads_per_layer=[2, 2], heads_concat_per_layer=[True, False],
        head_output_features_per_layer=[f_in, 8, 4], num_classes=4,
        add_skip_connection=[False, True], dropout=dropout)


def test_cluster_reorder_is_consistent_permutation():
    x, s, r = make_clustered_graph(seed=1)
    g = T.canonicalize(x, s, r, reorder="cluster")
    order = np.asarray(g.node_order)
    n = x.shape[0]
    # a valid permutation of the real nodes, identity on padding
    assert sorted(order[:n]) == list(range(n))
    # features moved consistently with the relabeling
    np.testing.assert_array_equal(np.asarray(g.x)[:n], x[order[:n]])


def test_hybrid_layout_partitions_every_edge_once():
    x, s, r = make_clustered_graph(seed=2)
    g = T.canonicalize(x, s, r, reorder="cluster", src_windows=True,
                       hybrid=True)
    bl = g.block_layout
    assert bl is not None
    e = int(np.asarray(g.edge_mask).sum())
    send = np.asarray(g.senders)[:e]
    recv = np.asarray(g.receivers)[:e]
    want = sorted(zip(send.tolist(), recv.tolist()))
    ls, lr = np.asarray(bl.send), np.asarray(bl.recv)
    local = list(zip(ls[lr >= 0].tolist(), lr[lr >= 0].tolist()))
    if bl.rem_send is not None:
        rs = np.asarray(bl.rem_send)[:bl.rem_e]
        rr = np.asarray(bl.rem_recv)[:bl.rem_e]
        assert (np.diff(rr) >= 0).all(), "remote must stay dst-sorted"
        ro = np.asarray(bl.rem_order)
        rs_pad = np.asarray(bl.rem_send)
        assert (np.diff(rs_pad[ro]) >= 0).all(), \
            "rem_order must sender-sort the padded remote edges"
        local += list(zip(rs.tolist(), rr.tolist()))
    assert sorted(local) == want, \
        "local + remote must partition the real edges exactly"


def test_hybrid_layout_monotone_bases():
    """The suffix-min monotonisation must certify the sliding d(h)
    accumulator (dmax >= 0) on cluster-ordered SBM graphs — per-tile
    best-coverage windows jitter within clusters otherwise."""
    x, s, r = make_clustered_graph(seed=3, n=1500)
    g = T.canonicalize(x, s, r, reorder="cluster", src_windows=True,
                       hybrid=True)
    bl = g.block_layout
    tb = np.asarray(bl.tile_base)
    assert (np.diff(tb) >= 0).all()
    assert bl.dmax >= 0
    assert int(np.diff(tb).max() if tb.size > 1 else 0) + 8 <= bl.dmax


@pytest.mark.parametrize("rem_path", ["xla", "v5"])
def test_hybrid_forward_and_grads_match_xla(monkeypatch, rem_path):
    monkeypatch.setenv("GAT_TPU_V6", "1")
    monkeypatch.setenv("GAT_TPU_V6_DTYPE", "float32")
    if rem_path == "v5":
        # force the LARGE-remainder branch (v5_sweep1_parts kernel)
        monkeypatch.setenv("GAT_TPU_HYBRID_REM_XLA_MAX", "0")
    x, s, r = make_clustered_graph(seed=4)
    g = T.canonicalize(x, s, r, reorder="cluster", src_windows=True,
                       hybrid=True)
    assert g.block_layout is not None and g.block_layout.rem_send is not None
    cfg = tiny_cfg()
    params = gat.init_gat_model(jax.random.key(3), cfg)

    import gat_pytorch_tpu.models.gat as gatmod
    calls = []
    orig7 = gatmod.fsw.v7_sweep1_parts
    orig5 = gatmod.fsa.v5_sweep1_parts
    monkeypatch.setattr(gatmod.fsw, "v7_sweep1_parts",
                        lambda *a, **k: calls.append("v7") or orig7(*a, **k))
    monkeypatch.setattr(gatmod.fsa, "v5_sweep1_parts",
                        lambda *a, **k: calls.append("v5") or orig5(*a, **k))

    def loss(p, backend):
        out = gat.gat_model_apply(p, cfg, g, training=False,
                                  backend=backend)
        return jnp.mean(out ** 2)

    want_l, want_g = jax.value_and_grad(loss)(params, "xla")
    got_l, got_g = jax.value_and_grad(loss)(params, "pallas")
    # small remainders ride plain XLA segment ops (fixed Mosaic launch
    # costs measured away the win); the v5 kernel takes over past
    # GAT_TPU_HYBRID_REM_XLA_MAX
    assert "v7" in calls, calls
    assert ("v5" in calls) == (rem_path == "v5"), calls
    np.testing.assert_allclose(float(got_l), float(want_l), rtol=1e-5)
    for (path, a), (_, b) in zip(
            jax.tree_util.tree_leaves_with_path(got_g),
            jax.tree_util.tree_leaves_with_path(want_g)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-6,
            err_msg=f"grad mismatch at {jax.tree_util.keystr(path)}")


def test_hybrid_requires_v10(monkeypatch):
    """With GAT_TPU_V10=0 the single-sweep parts don't exist; the hybrid
    layout must NOT route through the full v7 op (which would see only
    the local edges) — it falls back to a correct full-edge path."""
    monkeypatch.setenv("GAT_TPU_V6", "1")
    monkeypatch.setenv("GAT_TPU_V6_DTYPE", "float32")
    monkeypatch.setenv("GAT_TPU_V10", "0")
    x, s, r = make_clustered_graph(seed=5)
    g = T.canonicalize(x, s, r, reorder="cluster", src_windows=True,
                       hybrid=True)
    cfg = tiny_cfg()
    params = gat.init_gat_model(jax.random.key(4), cfg)
    want = gat.gat_model_apply(params, cfg, g, training=False,
                               backend="xla")
    got = gat.gat_model_apply(params, cfg, g, training=False,
                              backend="pallas")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-5)


def test_hybrid_dropout_trains():
    """Attention dropout on the hybrid path: two independent layout-order
    masks; a short training loop must run finite and decrease loss."""
    import os
    os.environ["GAT_TPU_V6"] = "1"
    os.environ["GAT_TPU_V6_DTYPE"] = "float32"
    try:
        x, s, r = make_clustered_graph(seed=6)
        rng = np.random.default_rng(0)
        y = rng.integers(0, 4, x.shape[0])
        g = T.canonicalize(x, s, r, y=y,
                           train_mask=np.ones(x.shape[0], bool),
                           reorder="cluster", src_windows=True,
                           hybrid=True)
        cfg = tiny_cfg(dropout=0.3)
        from gat_pytorch_tpu.train import optim as O
        from gat_pytorch_tpu.train.tasks import make_task
        from gat_pytorch_tpu.train.trainer import TrainState, make_train_step
        tx = O.adam_l2(1e-2)
        params = gat.init_gat_model(jax.random.key(5), cfg)
        state = TrainState(params=params, opt_state=tx.init(params),
                           rng=jax.random.key(6), step=jnp.int32(0))
        step = make_train_step(cfg, make_task("Cora"), tx)
        losses = []
        os.environ["GAT_TPU_BACKEND"] = "pallas"
        for _ in range(8):
            state, mets = step(state, g)
            losses.append(float(mets["train_loss"]))
        assert np.isfinite(losses).all()
        assert losses[-1] < losses[0]
    finally:
        os.environ.pop("GAT_TPU_BACKEND", None)
        os.environ.pop("GAT_TPU_V6", None)
        os.environ.pop("GAT_TPU_V6_DTYPE", None)
