"""Row gather with a sorted-segment-sum transpose.

`gather_rows_src_sorted(table, indices, order, num_segments)` computes
`table[indices]` exactly like jnp.take, but its VJP accumulates the
cotangent with the Pallas sorted segment-sum instead of XLA's transpose
(an UNSORTED scatter-add over the sender axis — the one reduction the
dst-sorted edge layout cannot make sorted). `order` is the
precomputed permutation that sorts `indices` ascending
(Graph.src_order, graph/transforms.py): the backward permutes the
cotangent rows by it (a gather, HBM-friendly) and reduces on the MXU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .segment_sum import segment_sum_pallas


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def gather_rows_src_sorted(table: jax.Array,     # (N, D)
                           indices: jax.Array,   # (E,) int32
                           order: jax.Array,     # (E,) perm sorting indices
                           num_segments: int,
                           interpret: bool = False) -> jax.Array:
    return jnp.take(table, indices, axis=0)


def _fwd(table, indices, order, num_segments, interpret):
    return jnp.take(table, indices, axis=0), (indices, order)


def _bwd(num_segments, interpret, res, g):
    indices, order = res
    g_sorted = jnp.take(g, order, axis=0)
    ids_sorted = jnp.take(indices, order, axis=0)
    d_table = segment_sum_pallas(g_sorted, ids_sorted, num_segments,
                                 interpret=interpret)
    return d_table, None, None


gather_rows_src_sorted.defvjp(_fwd, _bwd)
