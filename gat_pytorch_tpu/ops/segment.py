"""Segment-reduction primitives over destination-sorted edge lists.

These are the TPU-native equivalents of the reference's single L0 primitive
`sum_over_neighbourhood` (reference: models/utils.py:6-27, a
`scatter_add_`-based segment sum) and its gather-broadcast companion
(`torch.index_select`, reference: models/gat_layer.py:106).

Design notes (TPU-first):
  * All functions are shape-polymorphic in nothing: `num_segments` is static,
    edge arrays are padded to static sizes, and padding is expressed with an
    explicit `edge_mask` so jit never recompiles.
  * Edges are destination-sorted at preprocessing time (see graph/transforms),
    so every reduction can use ``indices_are_sorted=True`` — XLA lowers this
    to a deterministic, atomics-free sorted scatter that vectorises on the
    VPU. This is the structural reason TPU needs no scatter atomics.
  * Padding edges must be routed to a segment id equal to ``num_segments``
    (one past the end) *or* masked to zero values. We do both belt-and-braces:
    callers zero values with the mask; these helpers clamp ids.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def segment_sum(values: jax.Array,
                segment_ids: jax.Array,
                num_segments: int,
                *,
                indices_are_sorted: bool = True) -> jax.Array:
    """Sum `values` rows into `num_segments` buckets keyed by `segment_ids`.

    values:      (E, ...) float array.
    segment_ids: (E,) int32 destination-node ids, sorted ascending when
                 `indices_are_sorted` (padding edges may carry id >= num_segments;
                 they are dropped by XLA's out-of-bounds-scatter semantics).
    Returns (num_segments, ...).
    """
    return jax.ops.segment_sum(
        values, segment_ids, num_segments=num_segments,
        indices_are_sorted=indices_are_sorted)


def segment_max(values: jax.Array,
                segment_ids: jax.Array,
                num_segments: int,
                *,
                indices_are_sorted: bool = True) -> jax.Array:
    """Per-segment max; empty segments get -inf."""
    return jax.ops.segment_max(
        values, segment_ids, num_segments=num_segments,
        indices_are_sorted=indices_are_sorted)


def gather_rows(table: jax.Array, indices: jax.Array) -> jax.Array:
    """Row gather `table[indices]` (reference: torch.index_select).

    XLA lowers this to a dynamic-gather which on TPU streams rows from HBM;
    keep rows >= 128 lanes wide where possible for full bandwidth.
    NOTE: the VJP of this plain take is an UNSORTED XLA scatter-add —
    ~seconds at millions of edges on TPU. Inside differentiated layer
    code prefer `gather_rows_sorted_grad` (dst-sorted ids) or pass
    src_order (models/gat.py logits path).
    """
    return jnp.take(table, indices, axis=0, indices_are_sorted=False,
                    unique_indices=False, fill_value=None)


import functools as _functools  # noqa: E402  (local to avoid cycle)


@_functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _gather_rows_presorted(table: jax.Array,       # (N, ...) node table
                           indices: jax.Array,     # (E,) int32 ASCENDING
                           num_segments: int) -> jax.Array:
    return jnp.take(table, indices, axis=0)


def _grp_fwd(table, indices, num_segments):
    return jnp.take(table, indices, axis=0), indices


def _grp_bwd(num_segments, indices, g):
    return (segment_sum(g, indices, num_segments,
                        indices_are_sorted=True), None)


_gather_rows_presorted.defvjp(_grp_fwd, _grp_bwd)


@_functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _gather_rows_ordered(table: jax.Array,
                         indices: jax.Array,       # (E,) int32 arbitrary
                         order: jax.Array,         # perm sorting indices
                         num_segments: int) -> jax.Array:
    return jnp.take(table, indices, axis=0)


def _gro_fwd(table, indices, order, num_segments):
    return jnp.take(table, indices, axis=0), (indices, order)


def _gro_bwd(num_segments, res, g):
    indices, order = res
    g = jnp.take(g, order, axis=0)
    ids = jnp.take(indices, order, axis=0)
    return (segment_sum(g, ids, num_segments, indices_are_sorted=True),
            None, None)


_gather_rows_ordered.defvjp(_gro_fwd, _gro_bwd)


def gather_rows_sorted_grad(table: jax.Array,
                            indices: jax.Array,
                            num_segments: int,
                            order: jax.Array | None = None) -> jax.Array:
    """`table[indices]` whose TRANSPOSE is a SORTED segment sum instead
    of XLA's unsorted scatter-add (which serialises and costs seconds at
    millions of edges — docs/PERF.md r2). `order` is a permutation
    sorting `indices` ascending; pass None when indices are already
    sorted (e.g. dst-sorted receivers). Dispatches to fixed-arity
    custom-vjp primitives (a defaulted array arg would skew the vjp's
    output arity)."""
    if order is None:
        return _gather_rows_presorted(table, indices, num_segments)
    return _gather_rows_ordered(table, indices, order, num_segments)


def segment_softmax(logits: jax.Array,
                    segment_ids: jax.Array,
                    num_segments: int,
                    *,
                    edge_mask: jax.Array | None = None,
                    eps: float = 1e-8,
                    subtract_segment_max: bool = False,
                    edge_axis: str | None = None) -> jax.Array:
    """Softmax over variable-size segments (in-neighbourhoods).

    Matches the reference semantics (models/gat_layer.py:96-109): plain
    ``exp(logit) / (segment_sum(exp) + eps)`` — by default *without*
    per-segment max subtraction, because the reference applies one global
    max-cap earlier in the pipeline instead. Set ``subtract_segment_max`` for
    the numerically standard variant.

    logits:   (E, H)
    returns:  (E, H) normalised attention coefficients; padding edges -> 0.

    edge_axis: mesh axis name when the edge arrays are sharded (node-sized
    partial reductions completed with pmax/psum — the distributed softmax
    for neighbourhoods cut across chips, SURVEY.md §5.7).
    """
    if subtract_segment_max:
        # detached: softmax is invariant to per-segment shifts, so the
        # max's gradient contribution cancels exactly — and lax.pmax has
        # no differentiation rule anyway
        seg_max = jax.lax.stop_gradient(
            segment_max(logits, segment_ids, num_segments))
        if edge_axis is not None:
            seg_max = jax.lax.pmax(seg_max, edge_axis)
        seg_max = jnp.where(jnp.isfinite(seg_max), seg_max, 0.0)
        logits = logits - gather_rows(seg_max, segment_ids)
    ex = jnp.exp(logits)
    if edge_mask is not None:
        ex = jnp.where(edge_mask[:, None], ex, 0.0)
    denom = segment_sum(ex, segment_ids, num_segments)
    if edge_axis is not None:
        denom = jax.lax.psum(denom, edge_axis)
    # segment_ids are sorted (segment_sum above relies on it), so the
    # gather's transpose can be a sorted reduction too. Under shard_map's
    # varying-axes checker the custom-vjp gather trips pvary typing —
    # keep the plain take there (models/gat.py rationale).
    if edge_axis is None and segment_ids.shape[0] >= 200_000:
        denom_per_edge = gather_rows_sorted_grad(denom, segment_ids,
                                                 num_segments)
    else:
        denom_per_edge = gather_rows(denom, segment_ids)
    out = ex / (denom_per_edge + eps)
    if edge_mask is not None:
        out = jnp.where(edge_mask[:, None], out, 0.0)
    return out


def segment_mean(values: jax.Array,
                 segment_ids: jax.Array,
                 num_segments: int) -> jax.Array:
    """Per-segment mean (empty segments -> 0)."""
    sums = segment_sum(values, segment_ids, num_segments)
    ones = jnp.ones(values.shape[:1], dtype=values.dtype)
    counts = segment_sum(ones, segment_ids, num_segments)
    return sums / jnp.maximum(counts, 1.0).reshape(
        (num_segments,) + (1,) * (values.ndim - 1))


def in_degree(segment_ids: jax.Array,
              num_segments: int,
              *,
              edge_mask: jax.Array | None = None,
              dtype=jnp.float32) -> jax.Array:
    """In-degree per destination node, counting only real (unmasked) edges."""
    ones = (jnp.ones(segment_ids.shape, dtype=dtype) if edge_mask is None
            else edge_mask.astype(dtype))
    return segment_sum(ones, segment_ids, num_segments)
