"""Destination-owner edge partitioning: boundary-free distributed softmax.

Round 1 sharded the dst-sorted edge list into equal-count slices, which
cuts neighbourhoods at arbitrary boundaries — every shard then psums
FULL (N, NH*F) numerator + (N, NH) denominator arrays over the edge axis
to complete the softmax (models/gat.py edge_axis paths): O(N) comm per
shard regardless of cut size.

This module implements the SURVEY §5.8 plan instead: re-bucket the edges
so shard j's contiguous slice holds EXACTLY the in-edges of its node
range [j*N/K, (j+1)*N/K). Segment softmax and the weighted aggregation
are then fully local (no cut neighbourhoods exist), and the only
per-layer communication is ONE tiled all_gather of the (N/K, NH*F)
output slices — measured ~3x less collective traffic than the psum
layout (tests/test_parallel_dst_owned.py counts HLO collective bytes).

The cost: per-shard edge counts are unequal, so every shard's slice is
padded to the max (static shapes for jit). Padding edges carry
logit-masking via edge_mask=False and point at the last node of their
shard's range, keeping each slice dst-sorted.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

from ..graph.graph import Graph, from_numpy


def _round_up(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


def partition_edges_by_dst(graph: Graph, k: int,
                           pad_multiple: int = 256,
                           eps: int = None) -> Tuple[Graph, int]:
    """Reorder + pad a canonicalised Graph's edge arrays for k dst-owner
    shards. Returns (graph2, edges_per_shard); graph2.num_edges ==
    k * edges_per_shard and slicing [j*eps, (j+1)*eps) yields shard j's
    edges (dst-sorted, dst in [j*N/k, (j+1)*N/k), padding masked).

    graph.num_nodes must be divisible by k (choose node buckets
    accordingly — loader/transforms pad_multiple).
    """
    n = graph.num_nodes
    if n % k != 0:
        raise ValueError(f"num_nodes {n} not divisible by k={k} "
                         f"(pick a node bucket divisible by the edge-axis "
                         f"size)")
    rows = n // k
    send = np.asarray(graph.senders)
    recv = np.asarray(graph.receivers)
    emask = np.asarray(graph.edge_mask)
    # drop existing padding edges; re-pad per shard below
    send, recv = send[emask], recv[emask]
    owner = recv // rows

    counts = np.bincount(owner, minlength=k)
    if eps is None:
        eps = _round_up(max(int(counts.max()), 1), pad_multiple)
    elif int(counts.max()) > eps:
        raise ValueError(f"per-shard bucket {eps} < max shard edge count "
                         f"{int(counts.max())}")

    # padding senders = N-1 so each shard's sender-sorted id stream stays
    # ascending with the padding at the tail (sorted-scatter backward)
    out_s = np.full(k * eps, n - 1, dtype=np.int64)
    out_r = np.empty(k * eps, dtype=np.int64)
    out_m = np.zeros(k * eps, dtype=bool)
    out_order = np.zeros(k * eps, dtype=np.int64)
    for j in range(k):
        sel = np.nonzero(owner == j)[0]        # already dst-sorted
        c = sel.size
        base = j * eps
        out_s[base:base + c] = send[sel]
        out_r[base:base + c] = recv[sel]
        out_m[base:base + c] = True
        # padding edges: last node of the shard's range (keeps the slice
        # dst-sorted; their -inf logits contribute nothing)
        out_r[base + c:base + eps] = (j + 1) * rows - 1
        # per-shard sender-sorting permutation (LOCAL indices) for the
        # sorted-scatter backward path
        out_order[base:base + eps] = np.concatenate(
            [np.argsort(out_s[base:base + c], kind="stable"),
             np.arange(c, eps)])
    g2 = from_numpy(
        np.asarray(graph.x), out_s, out_r,
        y=None if graph.y is None else np.asarray(graph.y),
        train_mask=None if graph.train_mask is None
        else np.asarray(graph.train_mask),
        val_mask=None if graph.val_mask is None
        else np.asarray(graph.val_mask),
        test_mask=None if graph.test_mask is None
        else np.asarray(graph.test_mask),
        edge_mask=out_m,
        node_mask=np.asarray(graph.node_mask),
        graph_ids=None if graph.graph_ids is None
        else np.asarray(graph.graph_ids),
        src_order=out_order)
    return g2, eps


def partition_batches(graphs, k: int, pad_multiple: int = 256,
                      eps: int = None):
    """Partition a list of same-bucket Graphs with ONE shared per-shard
    edge bucket (so they can be stacked along a batch axis for the
    sharded trainer). Returns (partitioned list, eps); pass the returned
    eps back on later epochs so reshuffled batches keep one static shape
    (one compilation)."""
    if eps is not None:
        return [partition_edges_by_dst(g, k, pad_multiple, eps=eps)[0]
                for g in graphs], eps
    parts = [partition_edges_by_dst(g, k, pad_multiple) for g in graphs]
    eps = max(e for _, e in parts)
    return [g if e == eps
            else partition_edges_by_dst(g0, k, pad_multiple, eps=eps)[0]
            for (g, e), g0 in zip(parts, graphs)], eps
