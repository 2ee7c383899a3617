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
                 src_windows: bool = False,
                 hybrid: bool = False) -> Graph:
    """Full preprocessing pipeline: self-loops -> dst-sort -> pad -> Graph.

    Padding layout: one extra padding node is always added (even when N is
    already a multiple) so padding edges have a dedicated sink; padding edges
    are (N_pad-1, N_pad-1) with edge_mask False, appended after the sorted
    real edges (receiver N_pad-1 keeps the dst-sorted invariant).

    reorder="rcm" relabels nodes by reverse Cuthill-McKee before sorting —
    bandwidth-minimising, so each destination tile's senders fall in a
    narrow id window (Graph.node_order maps outputs back to input ids).
    reorder="cluster" relabels by community (size-capped label
    propagation) with RCM order preserved within each cluster — the
    ordering for graphs RCM cannot band (e.g. the Pubmed-like SBM,
    VERDICT r3 item 3) whose locality is cluster-structured.
    src_windows=True additionally computes the per-tile window metadata
    (Graph.tile_lo / Graph.src_band) that gates the windowed-gather
    kernel (ops/pallas v6).
    hybrid=True (with src_windows) builds the SPLIT-LOCALITY layout
    instead (compute_hybrid_layout): per-dst-tile best-coverage sender
    windows route most edges through the v7 windowed kernel and the
    out-of-window remainder through the v5 table kernel, their
    UNNORMALISED single-sweep parts summed in one epilogue
    (models/gat.py hybrid branch).
    """
    senders = np.asarray(senders, dtype=np.int64)
    receivers = np.asarray(receivers, dtype=np.int64)
    n = int(x.shape[0])

    node_order = None
    if reorder in ("rcm", "cluster"):
        order = _core.rcm_order(senders, receivers, n)     # old id at new pos
        if reorder == "cluster":
            labels = label_propagation_capped(senders, receivers, n)
            rcm_rank = np.empty(n, dtype=np.int64)
            rcm_rank[order] = np.arange(n)
            # primary: cluster id; secondary: RCM rank within cluster
            order = np.lexsort((rcm_rank, labels))
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
        raise ValueError(f"unknown reorder {reorder!r} "
                         f"(expected 'rcm' or 'cluster')")

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
        if hybrid:
            block_layout = compute_hybrid_layout(senders_p, receivers_p,
                                                 e, n_pad)
        else:
            block_layout = compute_block_layout(senders_p, receivers_p,
                                                e, n_pad)

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
    # Round 5 extends the auto choice to nb: the round-4 Pubmed-fitted
    # cost model  slots x (nb + wb + K)  already ranked banded-5M's
    # nb=256 over the old fixed 512 (measured on-chip +17.6%, 64.6 ->
    # 55.0 ms/step — the dst one-hot is a pure per-edge nb cost and at
    # eb=1024 wb/slots barely move), so auto mode now builds candidate
    # layouts over nb in {256, 512} at ANY size (a 5M-edge build is
    # ~1.5 s host-side, one-time) and over eb in {eb, eb/2} for small
    # graphs (the round-3 Cora rule), picking the cost-model minimum.
    explicit_nb = nb is not None or "GAT_TPU_V7_NB" in os.environ
    explicit_eb = eb is not None or "GAT_TPU_V7_EB" in os.environ
    nb = nb or int(os.environ.get("GAT_TPU_V7_NB", "512"))
    eb = eb or int(os.environ.get("GAT_TPU_V7_EB", "1024"))
    if nb % 128 or eb % 128:
        raise ValueError(f"v7 block sizes must be 128-multiples, "
                         f"got nb={nb} eb={eb}")
    small = num_real_edges <= int(
        os.environ.get("GAT_TPU_V7_AUTOEB_MAX_E", "500000"))
    nb_cands = (nb,) if explicit_nb else (256, 512)
    eb_cands = ((eb,) if (explicit_eb or not small or eb <= 128)
                else (eb, eb // 2))
    if len(nb_cands) * len(eb_cands) > 1:
        cost_k = float(os.environ.get("GAT_TPU_V7_COST_K", "2560"))
        best, best_cost = None, None
        for nbx in nb_cands:
            for ebx in eb_cands:
                cand = compute_block_layout(
                    senders, receivers, num_real_edges, n_pad,
                    nb=nbx, eb=ebx, n_src=n_src)
                cost = cand.send.shape[0] * (cand.nb + cand.wb + cost_k)
                if best is None or cost < best_cost:
                    best, best_cost = cand, cost
        return best

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
    # per-tile pad slack). Candidates from span quantiles; pick the one
    # minimising the MEASURED cost model  slots x (nb + wb + K):
    # fitting the on-chip Pubmed wb-cap A/B (wb 4480@121k slots 2.588 ms,
    # 2048@160k 2.387, 1536@194k 2.546 — round 4) gives per-slot fixed
    # costs equivalent to K ~= 2560 window rows, i.e. splitting pays
    # only when it removes >K-row spans. (The previous 3%-slot-slack
    # acceptance rule rejected the measured winner.) GAT_TPU_V7_TARGET
    # forces a specific cap; GAT_TPU_V7_COST_K tunes the constant.
    st, en, ba, cnt = boundaries(None)
    wb = wb_of(st, en, ba)
    if st.shape[0]:
        cost_k = float(os.environ.get("GAT_TPU_V7_COST_K", "2560"))
        env_t = os.environ.get("GAT_TPU_V7_TARGET")
        if env_t:
            cands = [int(env_t)]
        else:
            # denser grid than the original 3 quantiles: the cost
            # landscape is shallow near its optimum (Pubmed: 8.0-8.3e8
            # across wb 2048-3584), so candidates must bracket it
            spans = ss[en - 1] - ba + 1
            cands = sorted(
                {int(round_up(int(q), 128)) for q in
                 np.quantile(spans, [0.25, 0.4, 0.55, 0.7, 0.85])}
                | {int(round_up(max(wb // d, 128), 128))
                   for d in (2, 3)})
        wb_naive = wb
        best = (st, en, ba, cnt, wb)
        best_cost = st.shape[0] * eb * (nb + wb + cost_k)
        for tg in cands:
            if tg >= wb_naive and not env_t:
                # a cap >= the naive wb never binds; still honour an
                # explicit GAT_TPU_V7_TARGET (documented as "forces a
                # specific cap" — ADVICE r4: silently skipping it left
                # the naive layout with no warning)
                continue
            st2, en2, ba2, cnt2 = boundaries(tg)
            wb2 = wb_of(st2, en2, ba2)
            cost2 = st2.shape[0] * eb * (nb + wb2 + cost_k)
            if env_t or cost2 < best_cost:
                best = (st2, en2, ba2, cnt2, wb2)
                best_cost = cost2
        st, en, ba, cnt, wb = best

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
        # monotonise non-monotone bases by SUFFIX-MIN when the window
        # growth is modest: per-tile best-coverage window choices (the
        # hybrid layout) jitter by small amounts within a cluster, which
        # would otherwise force the backward onto the serial per-tile
        # RMW path (dmax = -1). Lowering a tile's base only widens its
        # window — every block's edges stay covered (the clip argument
        # in models/gat.py's wb/window-max discussion).
        occ_base = np.where(has_t, tile_base, np.int64(2 ** 62))
        if has_t.any() and not (np.diff(tile_base[has_t]) >= 0).all():
            cand = np.minimum.accumulate(occ_base[::-1])[::-1]
            cand = np.where(has_t, cand, 0)
            window2 = int(round_up(
                max(int(np.where(has_t, tmax - cand + 1, 1).max()), wb),
                128))
            if window2 <= window + max(window // 3, 1024):
                tile_base, window = cand, window2
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


def label_propagation_capped(senders: np.ndarray, receivers: np.ndarray,
                             n: int, cap: Optional[int] = None,
                             rounds: int = 30) -> np.ndarray:
    """Community labels by synchronous label propagation with a SIZE CAP:
    each round every node adopts its in-neighbourhood's most frequent
    label (ties -> smaller label), but nodes that would JOIN a label
    already over `cap` members revert — plain LPA floods homophilous
    graphs into one giant component (measured on the Pubmed-like SBM:
    uncapped -> a 12.7k-node label at 33% cut; cap 8192 -> the 3 true
    ~6k communities at 11% cut). The cap bounds the window size the
    cluster ordering produces, which is what the VMEM-resident windowed
    kernel needs (compute_hybrid_layout). Labels are compacted to
    consecutive ints."""
    if cap is None:
        import os
        cap = int(os.environ.get("GAT_TPU_CLUSTER_CAP", "8192"))
    labels = np.arange(n, dtype=np.int64)
    big = n + 1
    for _ in range(rounds):
        key = receivers.astype(np.int64) * big + labels[senders]
        k = np.sort(key)
        starts = np.r_[0, np.nonzero(np.diff(k))[0] + 1]
        counts = np.diff(np.r_[starts, k.size])
        rcv = k[starts] // big
        lab = k[starts] % big
        # score packs (count, smaller-label-wins) into one maximum.at
        score = counts * big + (n - lab)
        best = np.zeros(n, np.int64)
        np.maximum.at(best, rcv, score)
        newlab = labels.copy()
        has = best > 0
        newlab[has] = n - (best[has] % big)
        sizes = np.bincount(newlab, minlength=n)
        joining = newlab != labels
        newlab[joining & (sizes[newlab] > cap)] = \
            labels[joining & (sizes[newlab] > cap)]
        if (newlab == labels).all():
            break
        labels = newlab
    _, inv = np.unique(labels, return_inverse=True)
    return inv.astype(np.int64)


def compute_hybrid_layout(senders: np.ndarray, receivers: np.ndarray,
                          num_real_edges: int, n_pad: int,
                          nb: Optional[int] = None,
                          eb: Optional[int] = None,
                          max_window: Optional[int] = None,
                          target_local_frac: float = 0.85,
                          min_local_frac: float = 0.5,
                          n_src: Optional[int] = None) -> BlockLayout:
    """SPLIT-LOCALITY layout (VERDICT r3 item 3): per nb-row destination
    tile, choose ONE static-width-W sender window maximising covered
    edges; in-window edges build the v7 block layout (windowed kernel,
    zero random crossings), the out-of-window remainder rides the v5
    table kernel, and models/gat.py sums the two ops' UNNORMALISED
    single-sweep (num, den) in one epilogue — exact, because the v10
    parts are additive over any edge partition.

    W is picked from quantiles of the per-tile minimal 90%-coverage
    spans: the smallest candidate <= max_window whose GLOBAL local
    fraction >= target_local_frac, else the best candidate with
    fraction >= min_local_frac, else the plain (non-hybrid) layout.
    This is label-free — the cluster ordering (reorder="cluster") makes
    the windows small on community-structured graphs, but any ordering
    works; the split only keys on sender-id windows."""
    import os
    nb = nb or int(os.environ.get("GAT_TPU_V7_NB", "512"))
    # hybrid default eb = 256, NOT the banded default 1024: hybrid
    # graphs' tiles spread edges over cluster-wide windows, so eb=1024
    # blocks span ~3.5k rows (wb past the narrow gate); eb=256 measured
    # wb 1024 at 8% fewer slots on the Pubmed stand-in. Override with
    # GAT_TPU_V7_HYBRID_EB.
    eb = eb or int(os.environ.get("GAT_TPU_V7_HYBRID_EB", "256"))
    if max_window is None:
        max_window = int(os.environ.get("GAT_TPU_HYBRID_MAX_W", "8192"))
    e = num_real_edges
    s = np.asarray(senders[:e], dtype=np.int64)
    r = np.asarray(receivers[:e], dtype=np.int64)
    t = -(-n_pad // nb)
    tid = r // nb
    order = np.lexsort((s, tid))
    ss = s[order]
    m = np.bincount(tid, minlength=t).astype(np.int64)
    off = np.zeros(t + 1, np.int64)
    off[1:] = np.cumsum(m)

    # per-tile minimal span covering 90% of the tile's (sender-sorted)
    # edges -> W candidates from their quantiles
    spans = []
    for ti in range(t):
        lo_i, hi_i = int(off[ti]), int(off[ti + 1])
        mt = hi_i - lo_i
        if mt == 0:
            continue
        tile = ss[lo_i:hi_i]
        k = max(int(np.ceil(0.9 * mt)), 1)
        spans.append(int((tile[k - 1:] - tile[:mt - k + 1]).min()) + 1)
    if not spans:
        return compute_block_layout(senders, receivers, e, n_pad,
                                    nb=nb, eb=eb, n_src=n_src)
    spans = np.asarray(spans)
    cands = sorted({int(round_up(int(q), 128)) for q in
                    np.quantile(spans, [0.5, 0.75, 0.9, 1.0])})
    cands = [c for c in cands if c <= max_window] or [max_window]

    def local_mask_for(w):
        mask = np.zeros(e, bool)
        for ti in range(t):
            lo_i, hi_i = int(off[ti]), int(off[ti + 1])
            mt = hi_i - lo_i
            if mt == 0:
                continue
            tile = ss[lo_i:hi_i]
            # two-pointer: best i maximising edges in [tile[i], tile[i]+w)
            j_ends = np.searchsorted(tile, tile + w, side="left")
            covered = j_ends - np.arange(mt)
            i_star = int(np.argmax(covered))
            mask[lo_i + i_star:lo_i + int(j_ends[i_star])] = True
        return mask

    best = None
    for w in cands:
        mask = local_mask_for(w)
        frac = float(mask.mean())
        if best is None or frac > best[1] + 1e-9:
            best = (w, frac, mask)
        if frac >= target_local_frac:
            best = (w, frac, mask)
            break
    w, frac, mask = best
    if frac < min_local_frac or (~mask).sum() == 0:
        # not enough locality to pay for the split (or nothing to
        # split): plain layout
        return compute_block_layout(senders, receivers, e, n_pad,
                                    nb=nb, eb=eb, n_src=n_src)

    # local part -> v7 block layout (edge order within the subset is
    # irrelevant; compute_block_layout re-sorts per tile)
    keep = order[mask]
    bl = compute_block_layout(s[np.sort(keep)], r[np.sort(keep)],
                              keep.size, n_pad, nb=nb, eb=eb, n_src=n_src)
    # remainder -> dst-sorted + sender-sort permutation, padded to a
    # 128-multiple with sink edges (id n_pad-1: sorts last, masked by
    # e_real in the v5 kernel)
    import jax.numpy as jnp
    rem = np.sort(order[~mask])
    rs, rr_ = s[rem], r[rem]
    er = rem.size
    er_pad = round_up(max(er, 128), 128)
    # pad senders index the SOURCE table (global under the dst-owner
    # sharded layout, where n_src covers the replicated node range);
    # pad receivers stay in the local dst range. Both are masked by
    # e_real in the v5 kernels — the sink choice only keeps sorts tidy.
    sink = (n_src if n_src is not None else n_pad) - 1
    rsink = n_pad - 1
    rs = np.concatenate([rs, np.full(er_pad - er, sink, np.int64)])
    rr_ = np.concatenate([rr_, np.full(er_pad - er, rsink, np.int64)])
    rorder = np.argsort(rs, kind="stable")
    return BlockLayout(
        send=bl.send, recv=bl.recv, base=bl.base, tile_ptr=bl.tile_ptr,
        tile_base=bl.tile_base, wb=bl.wb, window=bl.window, nb=bl.nb,
        eb=bl.eb, dmax=bl.dmax,
        rem_send=jnp.asarray(rs.astype(np.int32)),
        rem_recv=jnp.asarray(rr_.astype(np.int32)),
        rem_order=jnp.asarray(rorder.astype(np.int32)),
        rem_e=int(er))
