"""Native C++ graphcore vs the numpy spec (same semantics, both paths).

The binding (graph/graphcore_binding.py) falls back to numpy when the
shared library isn't built; these tests compare the two directly, so
they only run when `make -C csrc` has produced _graphcore.so.
"""

import numpy as np
import pytest

from gat_pytorch_tpu.graph import graphcore_binding as core

pytestmark = pytest.mark.skipif(not core.native_available(),
                                reason="_graphcore.so not built")


def _numpy_impls():
    """Force the numpy fallback by temporarily hiding the library."""
    class Fallback:
        def __getattr__(self, name):
            fn = getattr(core, name)

            def call(*a, **kw):
                lib, core._lib = core._lib, None
                saved = core._LIB_PATH
                core._LIB_PATH = "/nonexistent"
                try:
                    return fn(*a, **kw)
                finally:
                    core._lib = lib
                    core._LIB_PATH = saved
            return call
    return Fallback()


NP = _numpy_impls()


def random_edges(n=200, e=900, seed=0):
    rng = np.random.default_rng(seed)
    return (rng.integers(0, n, e).astype(np.int64),
            rng.integers(0, n, e).astype(np.int64))


def test_self_loops_native_matches_numpy():
    s, r = random_edges()
    got = core.add_remaining_self_loops(s, r, 200)
    want = NP.add_remaining_self_loops(s, r, 200)
    for a, b in zip(got, want):
        np.testing.assert_array_equal(a, b)


def test_sort_native_matches_numpy_and_is_stable():
    s, r = random_edges(seed=1)
    gs, gr = core.sort_by_destination(s, r)
    ws, wr = NP.sort_by_destination(s, r)
    np.testing.assert_array_equal(gr, wr)
    np.testing.assert_array_equal(gs, ws)   # stability: same tie order


def test_csr_offsets_native_matches_numpy():
    s, r = random_edges(seed=2)
    _, r_sorted = core.sort_by_destination(s, r)
    got = core.csr_offsets(r_sorted, 200)
    want = NP.csr_offsets(r_sorted, 200)
    np.testing.assert_array_equal(got, want)
    assert got[-1] == len(r_sorted)


def test_block_diagonal_native_matches_numpy():
    rng = np.random.default_rng(3)
    ncounts = np.array([5, 8, 3], np.int64)
    ecounts = np.array([10, 20, 6], np.int64)
    s = np.concatenate([rng.integers(0, n, e)
                        for n, e in zip(ncounts, ecounts)]).astype(np.int64)
    r = np.concatenate([rng.integers(0, n, e)
                        for n, e in zip(ncounts, ecounts)]).astype(np.int64)
    got = core.block_diagonal(s, r, ncounts, ecounts)
    want = NP.block_diagonal(s, r, ncounts, ecounts)
    for a, b in zip(got, want):
        np.testing.assert_array_equal(a, b)


def test_sample_neighbors_invariants():
    s, r = random_edges(n=100, e=600, seed=4)
    ss, rr = core.sort_by_destination(s, r)
    offs = core.csr_offsets(rr, 100)
    seeds = np.array([0, 5, 50, 99], np.int64)
    src, dst = core.sample_neighbors(offs, ss, seeds, k=4, seed=7)
    assert src.shape == dst.shape
    edge_set = set(zip(ss.tolist(), rr.tolist()))
    for a, b in zip(src, dst):
        assert (int(a), int(b)) in edge_set
    # without replacement: exactly min(k, deg) samples per seed
    for v in seeds:
        deg = int(offs[v + 1] - offs[v])
        assert int((dst == v).sum()) == min(4, deg)


def test_sample_neighbors_without_replacement_uniform():
    """ADVICE r1 (low): the native path must sample distinct slots
    uniformly without replacement, matching the numpy spec — not
    with-replacement + dedupe (which under-fills and biases). Star graph:
    one hub with 12 distinct in-neighbours, fanout 4."""
    deg, k, trials = 12, 4, 3000
    senders = np.arange(1, deg + 1, dtype=np.int64)   # hub = node 0
    receivers = np.zeros(deg, dtype=np.int64)
    ss, rr = core.sort_by_destination(senders, receivers)
    offs = core.csr_offsets(rr, deg + 1)
    seeds = np.array([0], np.int64)

    counts = np.zeros(deg + 2, dtype=np.int64)
    for t in range(trials):
        src, dst = core.sample_neighbors(offs, ss, seeds, k=k, seed=1000 + t)
        # exactly k distinct draws every time
        assert src.size == k
        assert np.unique(src).size == k
        counts[src] += 1
    # each neighbour appears with P = k/deg = 1/3; bound the empirical
    # frequency within 5 sigma of the binomial std
    p = k / deg
    sigma = (trials * p * (1 - p)) ** 0.5
    dev = np.abs(counts[1:deg + 1] - trials * p)
    assert (dev < 5 * sigma).all(), counts[1:deg + 1]
