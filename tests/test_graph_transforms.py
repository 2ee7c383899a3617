"""Tests for graph canonicalisation (transforms) and the native graphcore."""

import numpy as np
import pytest

from gat_pytorch_tpu.graph import graphcore_binding as core
from gat_pytorch_tpu.graph import transforms as T
from gat_pytorch_tpu.data.synthetic import make_random_graph


def test_add_remaining_self_loops_semantics():
    # reference semantics (models/utils.py:47-67): drop (i,i), append all N
    s = np.array([0, 1, 2, 2])
    r = np.array([1, 1, 0, 2])  # edges (1,1) and (2,2) are self-loops
    out_s, out_r = T.add_remaining_self_loops(s, r, num_nodes=4)
    got = set(zip(out_s.tolist(), out_r.tolist()))
    assert got == {(0, 1), (2, 0), (0, 0), (1, 1), (2, 2), (3, 3)}
    assert len(out_s) == 2 + 4


def test_native_matches_numpy_self_loops():
    if not core.native_available():
        pytest.skip("graphcore not built")
    g = make_random_graph(0, 200, 5.0, 4)
    ns, nr = core.add_remaining_self_loops(g.senders, g.receivers, 200)
    keep = g.senders != g.receivers
    loop = np.arange(200)
    ws = np.concatenate([g.senders[keep], loop])
    wr = np.concatenate([g.receivers[keep], loop])
    np.testing.assert_array_equal(ns, ws)
    np.testing.assert_array_equal(nr, wr)


def test_sort_by_destination_stable():
    s = np.array([5, 4, 3, 2, 1, 0])
    r = np.array([2, 0, 2, 1, 0, 1])
    os_, or_ = T.sort_by_destination(s, r)
    assert (np.diff(or_) >= 0).all()
    # stability: within dst=0, original order (4 then 1) preserved
    np.testing.assert_array_equal(os_, [4, 1, 2, 0, 5, 3])


def test_native_sort_matches_numpy():
    if not core.native_available():
        pytest.skip("graphcore not built")
    g = make_random_graph(1, 500, 8.0, 4)
    ns, nr, perm = core.sort_by_destination(g.senders, g.receivers,
                                            return_perm=True)
    order = np.argsort(g.receivers, kind="stable")
    np.testing.assert_array_equal(ns, g.senders[order])
    np.testing.assert_array_equal(nr, g.receivers[order])
    np.testing.assert_array_equal(perm, order)


def test_csr_offsets():
    r = np.array([0, 0, 1, 3, 3, 3])
    offs = core.csr_offsets(r, 5)
    np.testing.assert_array_equal(offs, [0, 2, 3, 3, 6, 6])


def test_canonicalize_invariants():
    g = make_random_graph(2, 300, 6.0, 8)
    graph = T.canonicalize(g.x, g.senders, g.receivers, y=g.y)
    graph.validate()
    # self-loops present for every real node
    s = np.asarray(graph.senders)[np.asarray(graph.edge_mask)]
    r = np.asarray(graph.receivers)[np.asarray(graph.edge_mask)]
    loops = set(s[s == r].tolist())
    assert loops == set(range(300))
    # padding sizes are lane-aligned
    assert graph.num_nodes % 128 == 0
    assert graph.num_edges % 128 == 0
    assert int(graph.num_real_nodes) == 300


def test_canonicalize_explicit_buckets():
    g = make_random_graph(3, 50, 3.0, 4)
    graph = T.canonicalize(g.x, g.senders, g.receivers, y=g.y,
                           node_bucket=256, edge_bucket=512)
    assert graph.num_nodes == 256 and graph.num_edges == 512
    graph.validate()


def test_block_diagonal():
    s = np.array([0, 1, 0, 2])
    r = np.array([1, 0, 1, 0])
    nodes = np.array([2, 3])
    edges = np.array([2, 2])
    os_, or_, gids = core.block_diagonal(s, r, nodes, edges)
    np.testing.assert_array_equal(os_, [0, 1, 2, 4])
    np.testing.assert_array_equal(or_, [1, 0, 3, 2])
    np.testing.assert_array_equal(gids, [0, 0, 1, 1, 1])


def test_sample_neighbors():
    # star graph: node 0 has 10 in-edges
    r = np.zeros(10, np.int64)
    s = np.arange(1, 11, dtype=np.int64)
    offs = core.csr_offsets(r, 11)
    src, dst = core.sample_neighbors(offs, s, np.array([0]), k=4, seed=42)
    assert len(src) == 4
    assert (dst == 0).all()
    assert np.isin(src, s).all()
    # degree <= k: take all edges, deterministically
    src, dst = core.sample_neighbors(offs, s, np.array([0]), k=32, seed=1)
    np.testing.assert_array_equal(np.sort(src), s)


def test_canonicalize_zero_edge_graph():
    """A graph with no edges still trains (self-loops only)."""
    import jax
    from gat_pytorch_tpu.models import gat as G

    x = np.random.default_rng(0).normal(size=(10, 6)).astype(np.float32)
    g = T.canonicalize(x, np.zeros(0, np.int64), np.zeros(0, np.int64))
    g.validate()
    assert int(np.asarray(g.edge_mask).sum()) == 10  # self-loops
    cfg = G.GATLayerConfig(in_features=6, out_features=4, num_heads=2,
                           concat=True)
    params = G.init_gat_layer(jax.random.key(0), cfg)
    out = G.gat_layer_apply(params, cfg, g.x, g.senders, g.receivers,
                            g.edge_mask, g.num_nodes)
    assert np.isfinite(np.asarray(out)).all()


def test_canonicalize_single_node():
    g = T.canonicalize(np.ones((1, 3), np.float32),
                       np.zeros(0, np.int64), np.zeros(0, np.int64))
    g.validate()
    assert int(np.asarray(g.node_mask).sum()) == 1


def test_src_order_sorts_senders():
    rng = np.random.default_rng(1)
    s = rng.integers(0, 50, 200)
    r = rng.integers(0, 50, 200)
    x = rng.normal(size=(50, 4)).astype(np.float32)
    g = T.canonicalize(x, s, r)
    send = np.asarray(g.senders)
    order = np.asarray(g.src_order)
    assert (np.diff(send[order]) >= 0).all()
    assert sorted(order.tolist()) == list(range(g.num_edges))


# ---- RCM reordering + source-window metadata (windowed kernel, v6) --------

def test_rcm_order_native_matches_numpy(monkeypatch):
    rng = np.random.default_rng(0)
    n, e = 500, 3000
    s = rng.integers(0, n, e)
    r = rng.integers(0, n, e)
    got = core.rcm_order(s, r, n)
    assert sorted(got.tolist()) == list(range(n))
    monkeypatch.setattr(core, "_load", lambda: None)
    want = core.rcm_order(s, r, n)
    np.testing.assert_array_equal(got, want)


def test_rcm_reduces_bandwidth_on_shuffled_path():
    """A path graph under a random labelling has bandwidth ~n; RCM must
    recover the chain (bandwidth 1)."""
    rng = np.random.default_rng(1)
    n = 1000
    perm = rng.permutation(n)
    s = perm[np.arange(n - 1)]
    r = perm[np.arange(1, n)]
    order = core.rcm_order(s, r, n)
    rank = np.empty(n, np.int64)
    rank[order] = np.arange(n)
    assert np.abs(rank[s] - rank[r]).max() == 1


def test_compute_src_windows_band_semantics():
    """tile_lo = per-128-dst-tile min sender; src_band = max 512-tile
    span max_src - align8(min_src) + 1 over REAL edges only."""
    n_pad = 1024
    # real edges: tile 0 senders in [40, 200], tile 5 senders in [600, 700]
    recv = np.array([3, 100, 120, 640, 650], np.int64)
    send = np.array([40, 200, 77, 600, 700], np.int64)
    # a padding edge with a far-away sender must be ignored
    recv_p = np.concatenate([recv, [n_pad - 1]])
    send_p = np.concatenate([send, [0]])
    tile_lo, band = T.compute_src_windows(send_p, recv_p, 5, n_pad)
    assert tile_lo.shape == (8,)
    assert tile_lo[0] == 40 and tile_lo[5] == 600
    assert tile_lo[2] == np.int32(2 ** 31 - 1)  # empty tile
    # 512-tile 0 spans senders [40, 200] -> 200 - 40 + 1 = 161
    # 512-tile 1 spans senders [600, 700] -> 700 - 600 + 1 = 101
    assert band == 161


def test_canonicalize_rcm_is_model_equivariant():
    """reorder='rcm' relabels nodes; the GAT layer output on the
    reordered graph must equal the plain graph's output mapped through
    Graph.node_order (permutation equivariance, end-to-end through
    canonicalize)."""
    import jax
    from gat_pytorch_tpu.models import gat as G

    rng = np.random.default_rng(2)
    n, e = 120, 700
    s = rng.integers(0, n, e)
    r = rng.integers(0, n, e)
    x = rng.normal(size=(n, 6)).astype(np.float32)
    y = rng.integers(0, 3, n)
    g0 = T.canonicalize(x, s, r, y=y)
    g1 = T.canonicalize(x, s, r, y=y, reorder="rcm", src_windows=True)
    assert g1.src_band > 0 and g1.tile_lo is not None
    order = np.asarray(g1.node_order)[:n]
    np.testing.assert_array_equal(np.asarray(g1.y)[:n],
                                  np.asarray(g0.y)[order])
    cfg = G.GATLayerConfig(in_features=6, out_features=4, num_heads=2,
                           concat=True)
    params = G.init_gat_layer(jax.random.key(0), cfg)

    def run(g):
        return np.asarray(G.gat_layer_apply(
            params, cfg, g.x, g.senders, g.receivers, g.edge_mask,
            g.num_nodes, backend="xla"))

    np.testing.assert_allclose(run(g1)[:n], run(g0)[order],
                               rtol=1e-4, atol=1e-5)
