"""Host-side graph canonicalisation: self-loops, dst-sort, static padding.

These run once per graph *outside* jit (XLA needs static shapes; see
Graph docstring). A C++ fast path with identical semantics lives in
csrc/graphcore.cpp and is used automatically when built; the numpy
implementations here are the behavioural spec and the fallback.

Reference semantics matched:
  * `add_remaining_self_loops` — drop existing (i,i) edges, append one
    self-loop for every node 0..N-1 (reference: models/utils.py:47-67).
  * dst-sort replaces nothing in the reference (scatter_add needs no order);
    here it is the enabler for sorted segment ops and edge partitioning.
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import numpy as np

from . import graphcore_binding as _core
from .graph import BlockLayout, Graph, from_numpy


def add_remaining_self_loops(senders: np.ndarray, receivers: np.ndarray,
                             num_nodes: int) -> Tuple[np.ndarray, np.ndarray]:
    """Drop existing self-loops and append (i, i) for all i in [0, num_nodes)."""
    keep = senders != receivers
    loop = np.arange(num_nodes, dtype=senders.dtype)
    return (np.concatenate([senders[keep], loop]),
            np.concatenate([receivers[keep], loop]))


def sort_by_destination(senders: np.ndarray, receivers: np.ndarray,
                        *extra: np.ndarray):
    """Stable sort edges by receiver (destination). Returns sorted arrays."""
    order = np.argsort(receivers, kind="stable")
    out = (senders[order], receivers[order]) + tuple(a[order] for a in extra)
    return out


def round_up(n: int, multiple: int) -> int:
    return ((n + multiple - 1) // multiple) * multiple


def pad_bucket(n: int, multiple: int = 128, strategy: str = "multiple") -> int:
    """Static bucket size for n. 'multiple' rounds up to `multiple`
    (TPU lane width); 'pow2' rounds to the next power of two — fewer jit
    recompiles when sizes vary wildly (PPI/PATTERN batches)."""
    if strategy == "pow2":
        return max(multiple, 1 << math.ceil(math.log2(max(n, 1))))
    return max(multiple, round_up(n, multiple))


def canonicalize(x: np.ndarray,
                 senders: np.ndarray,
                 receivers: np.ndarray,
                 *,
                 y: Optional[np.ndarray] = None,
                 train_mask: Optional[np.ndarray] = None,
                 val_mask: Optional[np.ndarray] = None,
                 test_mask: Optional[np.ndarray] = None,
                 graph_ids: Optional[np.ndarray] = None,
                 add_self_loops: bool = True,
                 node_bucket: Optional[int] = None,
                 edge_bucket: Optional[int] = None,
                 pad_multiple: int = 128,
                 pad_strategy: str = "multiple",
                 reorder: Optional[str] = None,
                 src_windows: bool = False) -> Graph:
    """Full preprocessing pipeline: self-loops -> dst-sort -> pad -> Graph.

    Padding layout: one extra padding node is always added (even when N is
    already a multiple) so padding edges have a dedicated sink; padding edges
    are (N_pad-1, N_pad-1) with edge_mask False, appended after the sorted
    real edges (receiver N_pad-1 keeps the dst-sorted invariant).

    reorder="rcm" relabels nodes by reverse Cuthill-McKee before sorting —
    bandwidth-minimising, so each destination tile's senders fall in a
    narrow id window (Graph.node_order maps outputs back to input ids).
    src_windows=True additionally computes the per-tile window metadata
    (Graph.tile_lo / Graph.src_band) that gates the windowed-gather
    kernel (ops/pallas v6).
    """
    senders = np.asarray(senders, dtype=np.int64)
    receivers = np.asarray(receivers, dtype=np.int64)
    n = int(x.shape[0])

    node_order = None
    if reorder == "rcm":
        order = _core.rcm_order(senders, receivers, n)     # old id at new pos
        rank = np.empty(n, dtype=np.int64)
        rank[order] = np.arange(n)
        senders, receivers = rank[senders], rank[receivers]

        def take(a):
            return None if a is None else np.asarray(a)[order]
        x = take(x)
        y, train_mask, val_mask, test_mask, graph_ids = (
            take(y), take(train_mask), take(val_mask), take(test_mask),
            take(graph_ids))
        node_order = order
    elif reorder is not None:
        raise ValueError(f"unknown reorder {reorder!r} (expected 'rcm')")

    if add_self_loops:
        senders, receivers = _core.add_remaining_self_loops(
            senders, receivers, n)
    senders, receivers = _core.sort_by_destination(senders, receivers)

    e = int(senders.shape[0])
    n_pad = node_bucket if node_bucket else pad_bucket(
        n + 1, pad_multiple, pad_strategy)
    e_pad = edge_bucket if edge_bucket else pad_bucket(
        e, pad_multiple, pad_strategy)
    if n_pad < n + 1:
        raise ValueError(f"node_bucket {n_pad} < num_nodes+1 {n + 1}")
    if e_pad < e:
        raise ValueError(f"edge_bucket {e_pad} < num_edges {e}")

    def pad_nodes(a, fill=0):
        if a is None:
            return None
        pad_shape = (n_pad - a.shape[0],) + a.shape[1:]
        return np.concatenate([a, np.full(pad_shape, fill, dtype=a.dtype)])

    sink = n_pad - 1
    senders_p = np.concatenate(
        [senders, np.full(e_pad - e, sink, dtype=np.int64)]).astype(np.int32)
    receivers_p = np.concatenate(
        [receivers, np.full(e_pad - e, sink, dtype=np.int64)]).astype(np.int32)
    edge_mask = np.arange(e_pad) < e
    node_mask = np.arange(n_pad) < n

    # second edge view sorted by SENDER: the backward's gather-transpose
    # becomes a sorted segment-sum (src_order stable-sorts padded edges;
    # padding senders == sink sort last)
    src_order = np.argsort(senders_p, kind="stable").astype(np.int32)

    tile_lo, src_band, block_layout = (None, 0, None)
    if src_windows:
        tile_lo, src_band = compute_src_windows(
            senders_p, receivers_p, e, n_pad)
        block_layout = compute_block_layout(senders_p, receivers_p, e,
                                            n_pad)

    graph = from_numpy(
        pad_nodes(np.asarray(x)),
        senders_p, receivers_p,
        y=pad_nodes(None if y is None else np.asarray(y)),
        train_mask=pad_nodes(train_mask, False),
        val_mask=pad_nodes(val_mask, False),
        test_mask=pad_nodes(test_mask, False),
        edge_mask=edge_mask, node_mask=node_mask,
        graph_ids=pad_nodes(
            np.zeros(n, np.int32) if graph_ids is None
            else np.asarray(graph_ids, np.int32), fill=-1),
        src_order=src_order,
        tile_lo=tile_lo,
        node_order=None if node_order is None
        else np.concatenate([node_order,
                             np.arange(n, n_pad)]).astype(np.int32),
        src_band=src_band)
    if block_layout is not None:
        graph = graph.replace(block_layout=block_layout)
    return graph


def compute_src_windows(senders: np.ndarray, receivers: np.ndarray,
                        num_real_edges: int, n_pad: int,
                        granule: int = 128) -> Tuple[np.ndarray, int]:
    """Locality metadata for the windowed-gather kernel (Graph.tile_lo /
    Graph.src_band): over the REAL (non-padding) prefix of the dst-sorted
    edge list, per 128-row destination tile the min sender id (INT32_MAX
    if no edges), and the max 512-tile span max_src - align8(min_src) + 1
    — any window >= round8(band) covers every tile at any block size
    dividing 512 (tiles nest)."""
    i32max = np.int32(2 ** 31 - 1)
    s = np.asarray(senders[:num_real_edges], dtype=np.int64)
    r = np.asarray(receivers[:num_real_edges], dtype=np.int64)
    t128 = (n_pad + granule - 1) // granule
    lo = np.full(t128, i32max, dtype=np.int64)
    hi = np.full(t128, -1, dtype=np.int64)
    tid = r // granule
    np.minimum.at(lo, tid, s)
    np.maximum.at(hi, tid, s)
    # 512-tile band (the certification granularity)
    k = 512 // granule
    pad = (-t128) % k
    lo5 = np.pad(lo, (0, pad), constant_values=i32max).reshape(-1, k)
    hi5 = np.pad(hi, (0, pad), constant_values=-1).reshape(-1, k)
    lo5 = lo5.min(axis=1)
    hi5 = hi5.max(axis=1)
    occupied = hi5 >= 0
    if not occupied.any():
        return lo.astype(np.int32), 0
    span = hi5[occupied] - (lo5[occupied] // 8) * 8 + 1
    return lo.astype(np.int32), int(span.max())


def compute_block_layout(senders: np.ndarray, receivers: np.ndarray,
                         num_real_edges: int, n_pad: int,
                         nb: Optional[int] = None,
                         eb: Optional[int] = None,
                         n_src: Optional[int] = None) -> BlockLayout:
    """v7 block-local window layout (Graph.block_layout, consumed by
    ops/pallas/segment_attention_window.fused_gat_window_v7).

    Over the REAL prefix of the dst-sorted edge list: group edges by
    nb-row destination tile, sort each tile's edges by SENDER, pad every
    tile to a multiple of eb slots (pad slots: recv = -1, sender = the
    block's window base — benign), and record per eb-block the
    128-aligned min-sender window base. Because each tile's edges are
    src-sorted, consecutive blocks cover consecutive narrow sender
    ranges: the static block window `wb` (max block span, rounded to
    128) is typically a small fraction of the tile band, and every
    kernel contraction against the window shrinks proportionally.

    n_src: sender-id range when it differs from the dst row range
    (the dst-owner sharded layout: receivers are shard-LOCAL ids over
    n_pad = N/k rows while senders index the GLOBAL replicated node
    table). Defaults to n_pad (the single-device case)."""
    import os

    import jax.numpy as jnp

    # block-size knobs (both must be 128-multiples; the kernel is
    # generic in them — models/gat.py runs at the layout's sizes).
    # Defaults from the on-chip sweep (benchmarks/probe_v7_blocks.py,
    # banded 5M-edge step): eb=1024/nb=512 -> 95.1M edges/s vs 76.7M at
    # 512/256 — the static wb is set by sparse-tile outliers, so small
    # blocks only add per-block fixed costs; at eb=1024 the typical
    # block span equals wb.
    #
    # SMALL graphs invert the tradeoff: block count is tiny (per-block
    # fixed costs negligible) while every one-hot build and gather/
    # scatter contraction scales with slots*(nb+wb) — on Cora, eb=512
    # halves wb (1024 -> 512) with FEWER slots and measured +14%
    # (probe_blocks_v9, round 3: 0.3558 -> 0.3114 ms/step). When no
    # explicit size is given and the graph is small, build both
    # candidate layouts (host-side, one-time, cheap at this size) and
    # keep the one with the smaller slot-weighted row cost.
    explicit = (nb is not None or eb is not None
                or "GAT_TPU_V7_NB" in os.environ
                or "GAT_TPU_V7_EB" in os.environ)
    nb = nb or int(os.environ.get("GAT_TPU_V7_NB", "512"))
    eb = eb or int(os.environ.get("GAT_TPU_V7_EB", "1024"))
    if nb % 128 or eb % 128:
        raise ValueError(f"v7 block sizes must be 128-multiples, "
                         f"got nb={nb} eb={eb}")
    small = num_real_edges <= int(
        os.environ.get("GAT_TPU_V7_AUTOEB_MAX_E", "500000"))
    if not explicit and small and eb > 128:
        a = compute_block_layout(senders, receivers, num_real_edges,
                                 n_pad, nb=nb, eb=eb, n_src=n_src)
        b = compute_block_layout(senders, receivers, num_real_edges,
                                 n_pad, nb=nb, eb=eb // 2, n_src=n_src)
        cost_a = a.send.shape[0] * (a.nb + a.wb)
        cost_b = b.send.shape[0] * (b.nb + b.wb)
        return b if cost_b < cost_a else a

    s = np.asarray(senders[:num_real_edges], dtype=np.int64)
    r = np.asarray(receivers[:num_real_edges], dtype=np.int64)
    t = -(-n_pad // nb)
    tid = r // nb
    order = np.lexsort((s, tid))                  # by tile, then sender
    ss, rr = s[order], r[order]
    m = np.bincount(tid, minlength=t).astype(np.int64)   # edges per tile
    off = np.zeros(t + 1, np.int64)
    off[1:] = np.cumsum(m)

    def boundaries(target):
        """Greedy per-tile blocking over the src-sorted edges: close a
        block at eb edges OR when the next edge would push the block's
        128-aligned sender span past `target` (None = eb-chunking).
        Returns (starts, ends, bases, blocks-per-tile)."""
        starts, ends, bases = [], [], []
        counts = np.zeros(t, np.int64)
        for ti in range(t):
            lo, hi = int(off[ti]), int(off[ti + 1])
            tile = ss[lo:hi]
            i = lo
            while i < hi:
                b = (int(ss[i]) // 128) * 128
                j = min(i + eb, hi)
                if target is not None:
                    j = min(j, lo + int(np.searchsorted(
                        tile, b + target, side="left")))
                    j = max(j, i + 1)
                starts.append(i)
                ends.append(j)
                bases.append(b)
                counts[ti] += 1
                i = j
        return (np.asarray(starts, np.int64), np.asarray(ends, np.int64),
                np.asarray(bases, np.int64), counts)

    def wb_of(st, en, ba):
        if st.shape[0] == 0:
            return 128
        return int(round_up(int((ss[en - 1] - ba + 1).max()), 128))

    # span-capped target selection: sparse-tile outliers set the naive
    # static wb far above the typical block span (banded bench: 1664 vs
    # ~1024 at band 4096); splitting just those blocks buys a smaller wb
    # for almost no extra slots (boundary shifts absorb into existing
    # per-tile pad slack). Candidates from span quantiles; keep the
    # smallest wb whose slot inflation stays under GAT_TPU_V7_SLOT_SLACK.
    st, en, ba, cnt = boundaries(None)
    wb = wb_of(st, en, ba)
    if st.shape[0]:
        slots0 = st.shape[0] * eb
        slack = float(os.environ.get("GAT_TPU_V7_SLOT_SLACK", "0.03"))
        env_t = os.environ.get("GAT_TPU_V7_TARGET")
        if env_t:
            cands = [int(env_t)]
        else:
            spans = ss[en - 1] - ba + 1
            cands = sorted({int(round_up(int(q), 128)) for q in
                            np.quantile(spans, [0.5, 0.75, 0.9])})
        for tg in cands:
            if tg >= wb:
                continue
            st2, en2, ba2, cnt2 = boundaries(tg)
            wb2 = wb_of(st2, en2, ba2)
            if (st2.shape[0] * eb <= slots0 * (1 + slack)
                    and wb2 < wb):
                st, en, ba, cnt, wb = st2, en2, ba2, cnt2, wb2
                break

    g = st.shape[0]
    e7 = g * eb
    tile_ptr = np.zeros(t + 1, np.int64)
    tile_ptr[1:] = np.cumsum(cnt * eb)
    if g == 0:
        base = np.zeros(1, np.int64)
        wb = 128
        tile_base = np.zeros(t, np.int64)
        window = 128
        send7 = np.zeros(0, np.int64)
        recv7 = np.zeros(0, np.int64)
    else:
        base = ba
        send7 = np.empty(e7, np.int64)
        recv7 = np.full(e7, -1, np.int64)
        for k in range(g):
            nk = int(en[k] - st[k])
            send7[k * eb:k * eb + nk] = ss[st[k]:en[k]]
            recv7[k * eb:k * eb + nk] = rr[st[k]:en[k]]
            send7[k * eb + nk:(k + 1) * eb] = ba[k]
        # per-tile window covering all of the tile's blocks
        bmax = ss[en - 1]
        blk_tile = np.repeat(np.arange(t), cnt)
        tmin = np.full(t, np.iinfo(np.int64).max)
        tmax = np.full(t, -1, np.int64)
        np.minimum.at(tmin, blk_tile, base)
        np.maximum.at(tmax, blk_tile, bmax)
        has_t = m > 0
        tile_base = np.where(
            has_t, np.minimum(tmin, n_src if n_src is not None else n_pad),
            0)
        window = int(round_up(
            max(int(np.where(has_t, tmax - tile_base + 1, 1).max()), wb),
            128))
        # forward-fill empty tiles' bases so they never break the
        # monotone-base property the sliding d(h) accumulator needs
        # (an empty tile has no blocks — its window content is unused)
        last = np.maximum.accumulate(
            np.where(has_t, np.arange(t), -1))
        tile_base = np.where(last >= 0,
                             tile_base[np.maximum(last, 0)], 0)
    # dmax: static bound (8-aligned, +8 slack for the kernel's
    # floor-to-8 of clipped bases) on consecutive tile-base deltas when
    # they are monotone non-decreasing — the certificate for the
    # backward's sliding-window d(h) accumulator (pure pipelined writes
    # instead of a serial per-tile HBM read-modify-write). -1 = the
    # bases are non-monotone and the kernel must keep the RMW path.
    dmax = -1
    if t >= 1:
        deltas = np.diff(tile_base) if t > 1 else np.zeros(1, np.int64)
        if (deltas >= 0).all():
            dmax = int(round_up(max(int(deltas.max()), 0) + 8, 8))
    return BlockLayout(
        send=jnp.asarray(send7.astype(np.int32)),
        recv=jnp.asarray(recv7.astype(np.int32)),
        base=jnp.asarray(base.astype(np.int32)),
        tile_ptr=jnp.asarray(tile_ptr.astype(np.int32)),
        tile_base=jnp.asarray(tile_base.astype(np.int32)),
        wb=int(wb), window=int(window), nb=int(nb), eb=int(eb),
        dmax=int(dmax))


def csr_offsets(receivers: np.ndarray, num_nodes: int) -> np.ndarray:
    """Row offsets (num_nodes+1,) of the dst-sorted edge list — the CSC/CSR
    view consumed by the Pallas kernels and the edge partitioner."""
    return _core.csr_offsets(receivers, num_nodes)
