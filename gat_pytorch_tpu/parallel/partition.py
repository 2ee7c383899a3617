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

from typing import Optional, Tuple

import numpy as np

from ..graph.graph import BlockLayout, Graph, from_numpy


def _round_up(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


def partition_edges_by_dst(graph: Graph, k: int,
                           pad_multiple: int = 256,
                           eps: int = None,
                           src_windows: bool = False,
                           nb: Optional[int] = None,
                           eb: Optional[int] = None,
                           hybrid: bool = False) -> Tuple[Graph, int]:
    """Reorder + pad a canonicalised Graph's edge arrays for k dst-owner
    shards. Returns (graph2, edges_per_shard); graph2.num_edges ==
    k * edges_per_shard and slicing [j*eps, (j+1)*eps) yields shard j's
    edges (dst-sorted, dst in [j*N/k, (j+1)*N/k), padding masked).

    graph.num_nodes must be divisible by k (choose node buckets
    accordingly — loader/transforms pad_multiple).

    src_windows=True additionally builds a PER-SHARD v7 block layout
    (compute_block_layout with shard-LOCAL receivers and GLOBAL senders)
    and attaches the k layouts STACKED along axis 0 as
    graph2.block_layout — shard j's slice is [j*X, (j+1)*X) of every
    layout array, with COMMON statics (wb/window = max over shards,
    dmax = max when every shard is monotone else -1, slot counts padded
    to the max shard). This is what lets the flagship v7/v10/v11
    windowed single-sweep kernels run on the dst-owner distributed
    layout (models/gat.py sharded v7 branch; VERDICT r3 item 1).
    nb/eb: explicit block sizes (defaults 512/1024 — the sharded builder
    must NOT use compute_block_layout's per-graph auto choice, which
    could pick different eb per shard)."""
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
    if src_windows:
        g2 = g2.replace(block_layout=_shard_block_layouts(
            out_s, out_r, out_m, k, eps, rows, n, nb=nb, eb=eb,
            hybrid=hybrid))
    return g2, eps


def _shard_block_layouts(out_s, out_r, out_m, k: int, eps: int,
                         rows: int, n: int,
                         nb: Optional[int] = None,
                         eb: Optional[int] = None,
                         hybrid: bool = False) -> BlockLayout:
    """Per-shard v7 block layouts (local receivers, global senders),
    stacked along axis 0 with common statics (see partition_edges_by_dst
    docstring). hybrid=True builds per-shard SPLIT-LOCALITY layouts
    (compute_hybrid_layout) instead: the in-window part stacks like the
    plain case, and the out-of-window remainders stack padded to a
    common bucket with per-shard real counts in rem_count (a DATA field
    — remainder sizes differ per shard, VERDICT r4 missing item 2: the
    +58% clustered-at-scale win previously vanished under sharding)."""
    import os

    import jax.numpy as jnp

    from ..graph.transforms import compute_block_layout
    from ..graph.transforms import compute_hybrid_layout
    explicit_nb = nb is not None or "GAT_TPU_V7_NB" in os.environ
    nb = nb or int(os.environ.get("GAT_TPU_V7_NB", "512"))
    eb = eb or int(os.environ.get(
        "GAT_TPU_V7_HYBRID_EB" if hybrid else "GAT_TPU_V7_EB",
        "256" if hybrid else "1024"))
    if not explicit_nb and not hybrid:
        # pick ONE nb for all shards by the same measured cost model as
        # the single-device auto chooser (round 5: banded-5M nb=256
        # measured +17.6% single-device and 1.03x-of-unsharded when
        # applied per shard), evaluated on shard 0 — shard layouts must
        # share statics, so the choice is global, not per shard
        from ..graph.transforms import compute_block_layout as _cbl
        cost_k = float(os.environ.get("GAT_TPU_V7_COST_K", "2560"))
        m0 = out_m[:eps]
        c0 = int(m0.sum())
        best = None
        for nbx in (256, 512):
            bl0 = _cbl(out_s[:eps][:c0], out_r[:eps][:c0], c0, rows,
                       nb=nbx, eb=eb, n_src=n)
            cost = bl0.send.shape[0] * (nbx + bl0.wb + cost_k)
            if best is None or cost < best[0]:
                best = (cost, nbx)
        nb = best[1]
    layouts = []
    for j in range(k):
        sl = slice(j * eps, (j + 1) * eps)
        mj = out_m[sl]
        c = int(mj.sum())
        if hybrid:
            layouts.append(compute_hybrid_layout(
                out_s[sl][:c], out_r[sl][:c] - j * rows, c, rows,
                nb=nb, eb=eb, n_src=n))
        else:
            layouts.append(compute_block_layout(
                out_s[sl][:c], out_r[sl][:c] - j * rows, c, rows,
                nb=nb, eb=eb, n_src=n))
    t = layouts[0].tile_base.shape[0]
    assert all(l.tile_base.shape[0] == t for l in layouts)
    slots = max(max(l.num_slots for l in layouts), eb)
    gmax = slots // eb
    wb = max(l.wb for l in layouts)
    window = max(l.window for l in layouts)
    dmax = (-1 if any(l.dmax < 0 for l in layouts)
            else max(l.dmax for l in layouts))

    def pad_to(a, size, fill):
        a = np.asarray(a)
        return np.concatenate(
            [a, np.full(size - a.shape[0], fill, a.dtype)])

    send = np.concatenate(
        [pad_to(l.send, slots, 0) for l in layouts])
    recv = np.concatenate(
        [pad_to(l.recv, slots, -1) for l in layouts])
    base = np.concatenate(
        [pad_to(l.base, gmax, 0) for l in layouts])
    tile_ptr = np.concatenate([np.asarray(l.tile_ptr) for l in layouts])
    tile_base = np.concatenate([np.asarray(l.tile_base)
                                for l in layouts])
    rem = {}
    if hybrid:
        # remainder arrays padded to one common bucket; a shard whose
        # hybrid layout degenerated to plain (not enough locality)
        # contributes an empty remainder (count 0). Pad senders point
        # at the global sink row, pad receivers at the shard's last
        # local row; the v5 parts kernel masks by rem_count anyway.
        ers = [0 if l.rem_send is None else int(l.rem_send.shape[0])
               for l in layouts]
        counts = [0 if l.rem_send is None else int(l.rem_e)
                  for l in layouts]
        if max(ers) == 0:
            rem = {}
            hybrid = False
        else:
            er_pad = max(128, _round_up(max(ers), 128))
            rs = np.full((k, er_pad), n - 1, np.int32)
            rr = np.full((k, er_pad), rows - 1, np.int32)
            ro = np.tile(np.arange(er_pad, dtype=np.int32), (k, 1))
            for j, l in enumerate(layouts):
                if l.rem_send is None:
                    continue
                m = ers[j]
                rs[j, :m] = np.asarray(l.rem_send)
                rr[j, :m] = np.asarray(l.rem_recv)
                # re-derive the sender-sort permutation over the PADDED
                # slice (pad senders == global sink sort last)
                ro[j] = np.argsort(rs[j], kind="stable").astype(np.int32)
            rem = dict(rem_send=jnp.asarray(rs.reshape(-1)),
                       rem_recv=jnp.asarray(rr.reshape(-1)),
                       rem_order=jnp.asarray(ro.reshape(-1)),
                       rem_count=jnp.asarray(
                           np.asarray(counts, np.int32)),
                       rem_e=int(max(counts)))
    return BlockLayout(
        send=jnp.asarray(send.astype(np.int32)),
        recv=jnp.asarray(recv.astype(np.int32)),
        base=jnp.asarray(base.astype(np.int32)),
        tile_ptr=jnp.asarray(tile_ptr.astype(np.int32)),
        tile_base=jnp.asarray(tile_base.astype(np.int32)),
        wb=int(wb), window=int(window), nb=int(nb), eb=int(eb),
        dmax=int(dmax), **rem)


def repad_block_layout(bl: BlockLayout, k: int, slots: int = None,
                       wb: int = None, window: int = None,
                       dmax: int = None,
                       rem_slots: int = None,
                       rem_e: int = None) -> BlockLayout:
    """Re-pad a STACKED per-shard layout (k shards along axis 0) to
    larger common sizes — unifies per-graph layouts so a batch of
    partitioned graphs stacks (stack_graphs keeps layouts only when
    shapes/statics agree). Pad slots carry recv == -1 (self-masking);
    wb/window/dmax only ever grow (coverage arguments in
    models/gat.py's sharded v7 branch hold for any window >= the
    layout's own)."""
    import jax.numpy as jnp
    cur = bl.send.shape[0] // k
    slots = max(slots or cur, cur)
    gcur = bl.base.shape[0] // k
    gmax = slots // bl.eb

    def pad2(a, width, fill):
        a = np.asarray(a).reshape(k, -1)
        return jnp.asarray(np.pad(a, ((0, 0), (0, width - a.shape[1])),
                                  constant_values=fill).reshape(-1))

    new_dmax = bl.dmax
    if dmax is not None:
        new_dmax = -1 if (dmax < 0 or bl.dmax < 0) else max(dmax, bl.dmax)
    rem = {}
    if bl.rem_send is not None:
        rcur = bl.rem_send.shape[0] // k
        rsl = max(rem_slots or rcur, rcur)
        if rsl != rcur:
            # pad senders/receivers keep their sink values; the padded
            # tail's rem_order entries are identity (pad senders are
            # the max id, so appending identity keeps the sort valid)
            rs2 = np.asarray(bl.rem_send).reshape(k, -1)
            sinks = rs2[:, -1:]
            rem_send = jnp.asarray(np.concatenate(
                [rs2, np.broadcast_to(sinks, (k, rsl - rcur))],
                axis=1).reshape(-1))
            rr2 = np.asarray(bl.rem_recv).reshape(k, -1)
            rem_recv = jnp.asarray(np.concatenate(
                [rr2, np.broadcast_to(rr2[:, -1:], (k, rsl - rcur))],
                axis=1).reshape(-1))
            ro2 = np.asarray(bl.rem_order).reshape(k, -1)
            ext = np.tile(np.arange(rcur, rsl, dtype=ro2.dtype), (k, 1))
            rem_order = jnp.asarray(
                np.concatenate([ro2, ext], axis=1).reshape(-1))
        else:
            rem_send, rem_recv, rem_order = (bl.rem_send, bl.rem_recv,
                                             bl.rem_order)
        rem = dict(rem_send=rem_send, rem_recv=rem_recv,
                   rem_order=rem_order, rem_count=bl.rem_count,
                   rem_e=max(rem_e or 0, bl.rem_e))
    return BlockLayout(
        send=pad2(bl.send, slots, 0) if slots != cur else bl.send,
        recv=pad2(bl.recv, slots, -1) if slots != cur else bl.recv,
        base=pad2(bl.base, gmax, 0) if gmax != gcur else bl.base,
        tile_ptr=bl.tile_ptr, tile_base=bl.tile_base,
        wb=max(wb or 0, bl.wb), window=max(window or 0, bl.window),
        nb=bl.nb, eb=bl.eb, dmax=new_dmax, **rem)


def _unify_batch_layouts(graphs, k: int):
    """Common (slots, wb, window, dmax) across a batch's stacked
    layouts, in place via repad_block_layout."""
    bls = [g.block_layout for g in graphs]
    slots = max(b.send.shape[0] // k for b in bls)
    wb = max(b.wb for b in bls)
    window = max(b.window for b in bls)
    dmax = (-1 if any(b.dmax < 0 for b in bls)
            else max(b.dmax for b in bls))
    kw = {}
    if all(b.rem_send is not None for b in bls):
        kw = dict(rem_slots=max(b.rem_send.shape[0] // k for b in bls),
                  rem_e=max(b.rem_e for b in bls))
    elif any(b.rem_send is not None for b in bls):
        # mixed hybrid/plain batch: drop the remainders (correctness
        # first — stack_graphs would reject the mixed tree anyway)
        bls = [BlockLayout(
            send=b.send, recv=b.recv, base=b.base, tile_ptr=b.tile_ptr,
            tile_base=b.tile_base, wb=b.wb, window=b.window, nb=b.nb,
            eb=b.eb, dmax=b.dmax) for b in bls]
    return [g.replace(block_layout=repad_block_layout(
                b, k, slots=slots, wb=wb, window=window, dmax=dmax,
                **kw))
            for g, b in zip(graphs, bls)]


def partition_batches(graphs, k: int, pad_multiple: int = 256,
                      eps: int = None, src_windows: bool = False,
                      hybrid: bool = False):
    """Partition a list of same-bucket Graphs with ONE shared per-shard
    edge bucket (so they can be stacked along a batch axis for the
    sharded trainer). Returns (partitioned list, eps); pass the returned
    eps back on later epochs so reshuffled batches keep one static shape
    (one compilation). src_windows: attach per-shard v7 layouts (see
    partition_edges_by_dst), unified across the batch so stack_graphs
    keeps them."""
    if eps is not None:
        out = [partition_edges_by_dst(g, k, pad_multiple, eps=eps,
                                      src_windows=src_windows,
                                      hybrid=hybrid)[0]
               for g in graphs]
        return (_unify_batch_layouts(out, k) if src_windows else out), eps
    parts = [partition_edges_by_dst(g, k, pad_multiple,
                                    src_windows=src_windows,
                                    hybrid=hybrid)
             for g in graphs]
    eps = max(e for _, e in parts)
    out = [g if e == eps
           else partition_edges_by_dst(g0, k, pad_multiple, eps=eps,
                                       src_windows=src_windows,
                                       hybrid=hybrid)[0]
           for (g, e), g0 in zip(parts, graphs)]
    return (_unify_batch_layouts(out, k) if src_windows else out), eps
