"""Unit tests for the segment-op primitive layer (ops/segment.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gat_pytorch_tpu.ops import segment as seg


def _sorted_ids(rng, e, n):
    return np.sort(rng.integers(0, n, size=e)).astype(np.int32)


def test_segment_sum_matches_numpy():
    rng = np.random.default_rng(0)
    e, n, h = 333, 47, 4
    ids = _sorted_ids(rng, e, n)
    vals = rng.standard_normal((e, h)).astype(np.float32)
    got = seg.segment_sum(jnp.asarray(vals), jnp.asarray(ids), n)
    want = np.zeros((n, h), np.float32)
    np.add.at(want, ids, vals)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-5)


def test_segment_sum_drops_out_of_range_padding():
    # padding edges carry id == num_segments; they must not contribute
    ids = jnp.array([0, 0, 1, 3, 3], dtype=jnp.int32)
    vals = jnp.ones((5, 2))
    got = seg.segment_sum(vals, ids, num_segments=3)
    np.testing.assert_allclose(np.asarray(got),
                               [[2, 2], [1, 1], [0, 0]])


def test_segment_softmax_rows_sum_to_one():
    rng = np.random.default_rng(1)
    e, n, h = 500, 60, 3
    ids = _sorted_ids(rng, e, n)
    logits = rng.standard_normal((e, h)).astype(np.float32) * 3
    alpha = seg.segment_softmax(jnp.asarray(logits), jnp.asarray(ids), n,
                                eps=0.0)
    sums = seg.segment_sum(alpha, jnp.asarray(ids), n)
    present = np.isin(np.arange(n), ids)
    np.testing.assert_allclose(np.asarray(sums)[present],
                               np.ones((present.sum(), h)), rtol=1e-5)


def test_segment_softmax_masked_padding_is_zero():
    ids = jnp.array([0, 0, 1, 1, 1], dtype=jnp.int32)
    logits = jnp.zeros((5, 2))
    mask = jnp.array([True, True, True, False, False])
    alpha = seg.segment_softmax(logits, ids, 2, edge_mask=mask, eps=0.0)
    a = np.asarray(alpha)
    np.testing.assert_allclose(a[3:], 0.0)
    np.testing.assert_allclose(a[:2], 0.5)
    np.testing.assert_allclose(a[2], 1.0)


def test_segment_softmax_max_subtraction_stable():
    ids = jnp.array([0, 0, 1], dtype=jnp.int32)
    logits = jnp.array([[1000.0], [999.0], [-1000.0]])
    alpha = seg.segment_softmax(logits, ids, 2, eps=0.0,
                                subtract_segment_max=True)
    a = np.asarray(alpha)
    assert np.isfinite(a).all()
    np.testing.assert_allclose(a[:, 0],
                               [1 / (1 + np.exp(-1)), 1 / (1 + np.exp(1)), 1],
                               rtol=1e-5)


def test_segment_softmax_reference_eps_semantics():
    # the reference divides by (denom + 1e-8) without max subtraction
    ids = jnp.array([0, 0], dtype=jnp.int32)
    logits = jnp.array([[0.0], [0.0]])
    alpha = seg.segment_softmax(logits, ids, 1, eps=1e-8)
    np.testing.assert_allclose(np.asarray(alpha)[:, 0], 1.0 / (2.0 + 1e-8))


def test_in_degree_and_mean():
    ids = jnp.array([0, 0, 2, 2, 2], dtype=jnp.int32)
    mask = jnp.array([True, True, True, True, False])
    deg = seg.in_degree(ids, 3, edge_mask=mask)
    np.testing.assert_allclose(np.asarray(deg), [2, 0, 2])
    vals = jnp.arange(5, dtype=jnp.float32)[:, None]
    mean = seg.segment_mean(vals, ids, 3)
    np.testing.assert_allclose(np.asarray(mean)[:, 0], [0.5, 0.0, 3.0])


def test_gather_rows():
    table = jnp.arange(12, dtype=jnp.float32).reshape(4, 3)
    idx = jnp.array([3, 0, 3], dtype=jnp.int32)
    got = seg.gather_rows(table, idx)
    np.testing.assert_allclose(np.asarray(got),
                               np.asarray(table)[[3, 0, 3]])


def test_segment_ops_jit_and_grad():
    ids = jnp.array([0, 0, 1], dtype=jnp.int32)

    @jax.jit
    def loss(v):
        return jnp.sum(seg.segment_softmax(v, ids, 2, eps=0.0) ** 2)

    g = jax.grad(loss)(jnp.array([[1.0], [2.0], [3.0]]))
    assert np.isfinite(np.asarray(g)).all()
