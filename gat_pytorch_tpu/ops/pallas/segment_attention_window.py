"""v6: windowed-gather whole-attention kernels for banded graphs.

The v5 table op (segment_attention.py) still pays two random node<->edge
row crossings per layer in XLA — the forward node->edge gather and the
backward d(h) permute — and each random row read/write costs a full
(8, 128) f32 tile (4 KB) regardless of the 512 B payload, which pins the
composite at ~0.14 of the idealized HBM roofline (docs/PERF.md round-2
close). v6 removes both crossings when the graph is BANDED: after a
reverse Cuthill-McKee relabelling (graph/transforms.py reorder="rcm",
csrc/graphcore.cpp gc_rcm_order) every destination tile's senders fall
in a narrow id window, so the kernel can

  * DMA the window rows h[base : base+W] HBM->VMEM SEQUENTIALLY (streamed
    once per tile, double-buffered across tiles; when W covers the WHOLE
    node table — the small-graph case, no reordering needed — the table
    is DMAed once and stays resident, and the backward accumulates d(h)
    entirely in VMEM, writing it back once at the last tile), and
  * gather in-VMEM with a one-hot MXU matmul: gathered_t (NHFL, EB) =
    wbuf_t (NHFL, W) @ onehot_w (W, EB), onehot_w[w, e] = [src_e == base+w]
    (Mosaic has no dynamic gather on this chip — the one-hot contraction
    IS the gather, and at W <= ~1k its FLOPs are cheaper than the 4 KB/row
    random-access tax),

and the backward accumulates d(h) per tile as d_win (W, NHFL) +=
onehot_w @ d_h_block, then read-add-writes the window back to the node
table — sequential traffic again, and the whole sorted-permute+scatter
pipeline of the v5 backward disappears.

The global logit max-cap (reference models/gat_layer.py:84-85) fuses in
as grid phase 0: grid = (2T,), tiles [0, T) stream the edges computing
the running (max, argmax-code) in VMEM scratch (persistent across the
sequential TPU grid), tiles [T, 2T) run the attention with the completed
cap — ONE kernel launch per layer forward instead of v5's two (at Cora
scale the step is launch/fixed-cost bound: 8 Mosaic launches ~200 us of
a 381 us backward — benchmarks/profile_step.py round 3).

Applicability is certified statically by Graph.src_band (max 512-tile
source span, host-computed at canonicalize): window W = round8(band)
must also satisfy W <= node-table rows. Everything else (semantics,
quirks, dropout composition) matches fused_gat_table_autocap; parity is
pinned against reference_segment_attention + the XLA oracle in
tests/test_window_kernel.py. Replaces reference models/gat_layer.py:70-127.

v7 (fused_gat_window_v7, Graph.block_layout): the one-hot construction
and its contractions cost O(W) VPU+MXU work PER EDGE, and W must cover a
whole tile's band. The v7 layout (graph/transforms.compute_block_layout)
sorts each tile's edges by SENDER and pads tiles to eb-multiples, so
every eb-edge block spans a far narrower sender range; the kernel then
builds the one-hot and runs the gather/scatter contractions against a
wb-row 128-aligned SLICE of the already-streamed tile window (wb = max
block span << W). Window DMA traffic is unchanged; per-edge VPU and MXU
work drop by W/wb (~3x on the 5M-edge banded benchmark). Same math, same
cap semantics, same VJP structure — pad slots carry recv == -1 and
self-mask through the destination one-hot.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .segment_attention import NEG_INF, _round_up


def _v6_dtype():
    """Contraction input dtype for the v6 one-hot gather/scatter
    matmuls. Unlike v5 (stream-bound, bf16 a wash), v6 is MXU-bound —
    these contractions ARE the gather — so bf16 inputs (f32
    accumulation via preferred_element_type) roughly double throughput.
    The rounding applies to the gathered h payload and the d(h)
    cotangent products, i.e. exactly the precision a bf16 feature table
    already concedes; logits, softmax, and all reductions stay f32.
    Override with GAT_TPU_V6_DTYPE=float32."""
    import os
    return (jnp.float32
            if os.environ.get("GAT_TPU_V6_DTYPE") == "float32"
            else jnp.bfloat16)

def _onehot_dtype():
    """Dtype for the one-hot operands of the v7 gather/scatter/acc
    dots. GAT_TPU_ONEHOT_DTYPE=int8 feeds the MXU s8 one-hots against
    bf16 values (mixed dots verified accepted by Mosaic on this chip —
    benchmarks/probe_int8_onehot.py, round 4); selection stays exact
    (0/1 values). Only meaningful in the bf16 contraction mode; the f32
    parity mode keeps f32 one-hots."""
    import os
    if (os.environ.get("GAT_TPU_ONEHOT_DTYPE") == "int8"
            and _v6_dtype() == jnp.bfloat16):
        return jnp.int8
    return _v6_dtype()


_I32_MAX = np.int32(2 ** 31 - 1)


def _dmak():
    """Blocks per grouped combined-stream DMA in the v7 path
    (GAT_TPU_V7_DMAK, default 4): per-block semaphore starts/waits
    measured ~13 ms of the banded 5M-edge step (docs/PERF.md
    round-2-resume DMA ablations), so meta+raw move in dmak-block
    groups through one fused stream."""
    import os
    return max(1, int(os.environ.get("GAT_TPU_V7_DMAK", "4")))


def _ablate():
    """Profiling-only kernel ablations (GAT_TPU_V7_ABLATE, comma list).
    Each token removes one class of in-kernel work so an on-chip A/B
    attributes the kernel's time budget (results become WRONG — never
    set outside benchmarks/probe_banded.py):
      cap     — skip the phase-0 cap sweep's block loop entirely
      onehot  — replace iota+compare one-hot construction by constants
      scores  — zero the s_src/s_dst_e score gathers (and their matmuls)
      gather  — zero the feature gather contraction
      scatter — skip the backward d(h) one-hot scatter contraction
      payload — zero the backward per-dst payload gather contraction
      exp     — replace the exp with identity (v7 bodies only)
      expander— zero the head-broadcast expander contractions (v7 only)
      accdot  — skip the fwd acc / bwd dsdst+dasrc accumulation dots (v7)
      dmam    — skip the per-block meta/raw/d_drop streams (stale reads)
      dmaw    — skip the per-tile window stream and d(h) RMW writeback
      winT    — replace the per-block window slice + Mosaic transpose
                (block_window's wbuf[ds].T) by a constant: attributes
                the per-block VMEM load + transpose cost (v7 only)
    """
    import os
    return frozenset(
        t for t in os.environ.get("GAT_TPU_V7_ABLATE", "").split(",") if t)


def _expander(nh8, nhf8, nh, f):
    rows = jax.lax.broadcasted_iota(jnp.int32, (nh8, nhf8), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (nh8, nhf8), 1)
    return ((cols // f == rows)
            & (rows < nh) & (cols < nh * f)).astype(jnp.float32)


def _pair_slot(nhf: int) -> int:
    """v12 n-pack window packing (round 4, VERDICT r3 item 4): when a
    layer's nh*f fits in <= 64 lanes, the node table packs 128//slot
    nodes per 128-lane row (a free XLA reshape), the window one-hot
    indexes PACK rows, and a per-edge sub-index mask selects the slot —
    the window stream, one-hot construction, and gather/scatter
    contractions all shrink by the pack factor (2x for Cora/Pubmed
    layer 1's nhf=64, 16x for Cora layer 2's nhf=7). Returns the slot
    width (a divisor of 128, multiple of 8, >= round8(nhf)); 0 = no
    packing (nhf > 64). GAT_TPU_V12=0 disables."""
    import os
    if os.environ.get("GAT_TPU_V12", "1") == "0":
        return 0
    nhf8 = _round_up(nhf, 8)
    for slot in (8, 16, 32, 64):
        if nhf8 <= slot:
            return slot
    return 0


def _kernel_v6(tile_off_ref,       # (T+2,) int32: offsets | e_real
               base_ref,           # (T,) int32: per-tile window base (8-al.)
               bbase_ref,          # (G,) int32 per-BLOCK window base (v7;
               #                     128-aligned absolute rows) or (1,) dummy
               h_hbm,              # (N_rows, NHFL) node feature table
               meta_hbm,           # (MR, E_cols): [drop nh8?] recv/src group
               a_src_ref,          # (NHFL, NH8) VMEM whole
               s_dst_ref,          # (NH8, NB) VMEM per tile (i % T)
               acc_ref,            # (NHF8+NH8, NB) VMEM out per tile
               cap_ref, code_ref,  # (8, 128) VMEM outs, constant index
               *rest,
               eb: int, nb: int, nh: int, f: int, nh8: int,
               nhf8: int, nhfl: int, w: int, eps: float, slope: float,
               with_dropout: bool, resident: bool, wb: int = 0,
               dmak: int = 4, ablate: frozenset = frozenset(),
               sweep1: bool = False, gstream: bool = False,
               pair: int = 0):
    # wb > 0 selects the v7 BLOCK-LOCAL window mode (Graph.block_layout):
    # tile offsets are eb-aligned (no shared overlap blocks) and every
    # edge block's one-hot/gather/scatter contractions run against a
    # wb-row 128-aligned slice of the streamed tile window instead of the
    # whole w rows — VPU construction and MXU FLOPs per edge drop by w/wb.
    #
    # v7 additionally runs the v8 RAW-SCORE pipeline: the phase-0 cap
    # sweep already computes every edge's raw logit (s_src + s_dst) —
    # instead of discarding it, each block's (NH8, EB) f32 raw tile is
    # DMAed to raw_hbm, and phase 1 reads it back. The main phase then
    # needs NO score matmuls and NO f32 one-hots (the gather/acc
    # contractions take the one-hot in the contraction dtype directly),
    # and the one-hot row iotas are hoisted to tile level. Bit-identical
    # math — raw is the same dot_general output either way. Motivated by
    # the round-2 ablation sweep (docs/PERF.md): one-hot construction
    # 39 ms + score matmuls 18 ms of the 115.6 ms banded 5M step, vs
    # ~0.6 ms/layer of extra HBM traffic for the raw tiles.
    # sweep1 (v10, v7-only): SINGLE-SWEEP forward. The reference caps
    # raw logits BEFORE LeakyReLU, so every capped logit is <= 0 and
    # LeakyReLU(raw - cap) == slope*(raw - cap) EXACTLY (including the
    # argmax at 0; torch's grad convention there is slope too). exp is
    # then SEPARABLE: exp(slope*(raw-cap)) = exp(slope*raw')*K with raw'
    # the operand-level B-shifted raw (the caller folds a global upper
    # bound B >= max raw into s_dst, keeping ex <= 1 — overflow-safe)
    # and K a per-step scalar. The softmax quotient cancels K except in
    # the +1e-8 eps term, so the kernel can accumulate UNNORMALISED
    # num/den in the same sweep that tracks (max, argmax) — no phase
    # barrier, half the one-hot builds/meta reads/window streams — and
    # an XLA epilogue divides by (den + eps*exp(slope*cap')). Exact in
    # real arithmetic; float rounding differs ~1 ulp from the 2-phase
    # form (parity pinned by tests/test_window_kernel.py).
    v7 = wb > 0
    gpay_hbm = gbuf = gsems = None
    if v7 and gstream:
        # gstream (v11): the gathered bf16 payload rows are ALSO
        # persisted per group (gpay_hbm (NHFL, C) bf16, gbuf staging) —
        # a one-hot gather of bf16 values is an exact SELECTION, so the
        # backward reads bit-identical payloads instead of re-running
        # its gather contraction and window stream.
        (comb_hbm, gpay_hbm, wbuf, mbuf, sems, msems, capacc, codeacc,
         cbuf, rawsems, gbuf, gsems) = rest
    elif v7:
        # comb_hbm: (MR+NH8, C) combined meta+raw stream (phase 0 writes
        # it, phase 1 and the backward read it — ONE grouped DMA per
        # dmak blocks instead of separate per-block meta and raw
        # streams); cbuf is its (2, MR+NH8, dmak*eb) staging buffer,
        # mbuf the grouped (2, MR, dmak*eb) phase-0 meta reader.
        (comb_hbm, wbuf, mbuf, sems, msems, capacc, codeacc,
         cbuf, rawsems) = rest
    else:
        comb_hbm = cbuf = rawsems = None
        wbuf, mbuf, sems, msems, capacc, codeacc = rest
    mr = (nh8 if with_dropout else 0) + 8   # meta rows (_pack_meta_v6)
    i = pl.program_id(0)
    n_total = pl.num_programs(0)
    t = n_total if sweep1 else n_total // 2
    ti = i if sweep1 else jax.lax.rem(i, t)
    phase = jnp.int32(0) if sweep1 else i // t   # 0 = cap, 1 = attention
    if v7:
        lo = tile_off_ref[ti]         # eb-aligned by construction
    else:
        lo = (tile_off_ref[ti] // eb) * eb
    hi = tile_off_ref[ti + 1]
    e_real = tile_off_ref[t + 1]
    nblocks = pl.cdiv(hi - lo, eb)

    expander = _expander(nh8, nhf8, nh, f)
    a_src_t = a_src_ref[:].astype(jnp.float32)              # (NHFL, NH8)

    @pl.when(i == 0)
    def _():
        capacc[:] = (jnp.zeros_like(capacc) if "cap" in ablate
                     else jnp.full_like(capacc, NEG_INF))
        codeacc[:] = jnp.full_like(codeacc, _I32_MAX)

    dm_on = "dmam" not in ablate
    dw_on = "dmaw" not in ablate

    # ---- window stream ---------------------------------------------------
    if not dw_on:
        pass                          # profiling: stale wbuf reads
    elif resident:
        # window == whole node table: DMA it ONCE (grid is sequential, so
        # the i==0 wait covers every later tile), single slot
        @pl.when(i == 0)
        def _():
            cp = pltpu.make_async_copy(h_hbm.at[pl.ds(0, w), :],
                                       wbuf.at[0], sems.at[0])
            cp.start()
            cp.wait()
    else:
        # per-tile window, double-buffered across grid steps
        def dma_w(slot, gi):
            tix = jax.lax.rem(gi, t)
            base = pl.multiple_of((base_ref[tix] // 8) * 8, 8)
            return pltpu.make_async_copy(h_hbm.at[pl.ds(base, w), :],
                                         wbuf.at[slot], sems.at[slot])

        @pl.when(i == 0)
        def _():
            dma_w(0, 0).start()

        @pl.when(i + 1 < n_total)
        def _():
            dma_w((i + 1) % 2, i + 1).start()

        dma_w(i % 2, i).wait()
    wslot_ix = 0 if resident else jax.lax.rem(i, 2)
    if v7:
        win_t = s_src_win = None      # per-block slices instead
    else:
        win_t = wbuf[wslot_ix].astype(jnp.float32).T        # (NHFL, W)
        # per-tile source scores over the window: s_src_win (NH8, W)
        if "scores" in ablate:
            s_src_win = jnp.zeros((nh8, w), jnp.float32)
        else:
            s_src_win = jax.lax.dot_general(
                a_src_t, win_t, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)

    base_i = (base_ref[ti] // 8) * 8
    base_f = base_i.astype(jnp.float32)

    if v7:
        # hoisted one-hot row iotas: built once per TILE; the per-block
        # shift folds into the (1, EB) id rows instead (the iota+offset
        # used to be rebuilt per block per phase — a measurable slice of
        # the 39 ms construction cost in the round-2 ablation)
        rows_nb_f = jax.lax.broadcasted_iota(
            jnp.int32, (nb, eb), 0).astype(jnp.float32)
        rows_wb_f = jax.lax.broadcasted_iota(
            jnp.int32, (wb, eb), 0).astype(jnp.float32)

    def dma_m(slot, b):
        # legacy per-block meta stream; v7 fetches K-block GROUPS (one
        # DMA per dmak blocks — per-block semaphore ops measured ~13 ms
        # of the banded 5M step, docs/PERF.md round-2-resume)
        start = pl.multiple_of(lo + b * eb, eb)
        return pltpu.make_async_copy(meta_hbm.at[:, pl.ds(start, eb)],
                                     mbuf.at[slot], msems.at[slot])

    if v7:
        # GLOBAL stream geometry: v7 tiles are eb-aligned, so blocks tile
        # the edge columns contiguously across the whole grid. The
        # meta/combined streams run over GLOBAL dmak-block groups with a
        # one-group prefetch distance that survives tile boundaries —
        # the previous per-tile streams exposed a read latency at every
        # tile entry and drained the combined writes at every tile exit
        # (~5.5 blocks/tile on the banded 5M bench -> thousands of
        # serial DMA waits; grouping alone measured a wash, the stalls
        # were per-tile bootstrap/drain, docs/PERF.md round-2-resume).
        geb = dmak * eb               # group width (columns)
        g_total = tile_off_ref[t] // eb    # global block count
        ng_total = pl.cdiv(g_total, dmak)  # global group count

        def dma_mg(gg):
            # meta group read (phase 0): global columns [gg*geb, +geb)
            start = pl.multiple_of(gg * geb, eb)
            return pltpu.make_async_copy(
                meta_hbm.at[:, pl.ds(start, geb)], mbuf.at[gg % 2],
                msems.at[gg % 2])

        def dma_cw(gg):
            # combined meta+raw group write (phase 0 producer)
            start = pl.multiple_of(gg * geb, eb)
            return pltpu.make_async_copy(
                cbuf.at[gg % 2], comb_hbm.at[:, pl.ds(start, geb)],
                rawsems.at[gg % 2])

        def dma_cr(gg):
            # combined group read (phase 1 consumer)
            start = pl.multiple_of(gg * geb, eb)
            return pltpu.make_async_copy(
                comb_hbm.at[:, pl.ds(start, geb)], cbuf.at[gg % 2],
                rawsems.at[gg % 2])

        def dma_gw(gg):
            # gathered-payload group write (v11 producer)
            start = pl.multiple_of(gg * geb, eb)
            return pltpu.make_async_copy(
                gbuf.at[gg % 2], gpay_hbm.at[:, pl.ds(start, geb)],
                gsems.at[gg % 2])

    if not v7:
        # under the "cap" ablation phase 0 does nothing, so its initial
        # meta DMA must not start either (an unwaited completion would
        # leave the semaphore unbalanced at kernel exit)
        start_ok = (nblocks > 0) if "cap" not in ablate else (
            (nblocks > 0) & (phase == 1))

        @pl.when(start_ok)
        def _():
            dma_m(0, 0).start()

    def block_window(b, need_scores=True):
        """(win_t slice (NHFL, WN), s_src over it (NH8, WN), first row,
        row count) for block b — the whole tile window in legacy mode,
        the block's wb-row 128-aligned sub-window in v7 mode (loaded as
        a dynamic sublane slice of the wbuf REF — Mosaic has no
        dynamic_slice on values). The min/max keeps the slice inside
        [0, w); coverage survives the clamp because the slice end stays
        past the block's max sender (wb >= every block's span)."""
        if not v7:
            return win_t, s_src_win, base_f, w
        goff = lo // eb + b
        off = jnp.minimum(jnp.maximum(bbase_ref[goff] - base_i, 0),
                          w - wb)
        off = pl.multiple_of((off // 8) * 8, 8)
        if "winT" in ablate:
            blk_t = jnp.full((nhfl, wb), 1e-3, jnp.float32)
        else:
            blk = wbuf[wslot_ix, pl.ds(off, wb), :].astype(jnp.float32)
            blk_t = blk.T                                    # (NHFL, WB)
        if not need_scores or "scores" in ablate:
            s_src_blk = None
        else:
            s_src_blk = jax.lax.dot_general(
                a_src_t, blk_t, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)          # (NH8, WB)
        if "scores" in ablate and need_scores:
            s_src_blk = jnp.zeros((nh8, wb), jnp.float32)
        return blk_t, s_src_blk, (base_i + off).astype(jnp.float32), wb

    def edge_inputs(meta, b):
        start = pl.multiple_of(lo + b * eb, eb)
        recv_at = nh8 if with_dropout else 0
        recv_row = meta[recv_at:recv_at + 1, :]             # (1, EB)
        src_row = meta[recv_at + 1:recv_at + 2, :]          # (1, EB)
        wt_blk, ss_win, wrow0, wn = block_window(
            b, need_scores=not pair)
        if pair:
            # v12 n-pack: the window holds 128//pair nodes per row; the
            # one-hot indexes PACK rows, the gather runs at wn=wb/npack
            # rows, and a per-edge sub-index mask selects the slot. The
            # gather must happen HERE (scores derive from the selected
            # rows instead of a window score table). floor(s/npack) and
            # the remainder are exact in f32 below 2^24 (npack is a
            # power of two).
            npack = 128 // pair
            src_pk = jnp.floor(src_row * (1.0 / npack))
            sub = src_row - src_pk * npack                  # (1, EB)
            if "onehot" in ablate:
                onehot_dst = jnp.full((nb, eb), 1e-3, jnp.float32)
                onehot_w = jnp.full((wn, eb), 1e-3, jnp.float32)
            else:
                onehot_dst = ((recv_row - (ti * nb).astype(jnp.float32))
                              == rows_nb_f).astype(jnp.float32)
                onehot_w = ((src_pk - wrow0)
                            == rows_wb_f).astype(jnp.float32)
            dt = _v6_dtype()
            if "gather" in ablate:
                gathered = jnp.zeros((nhfl, eb), jnp.float32)
            else:
                gathered = jax.lax.dot_general(
                    wt_blk.astype(dt), onehot_w.astype(_onehot_dtype()),
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)     # (128, EB)
            h_sel = None
            for k in range(npack):
                m = (sub == float(k)).astype(jnp.float32)
                piece = gathered[k * pair:(k + 1) * pair, :] * m
                h_sel = piece if h_sel is None else h_sel + piece
            if "scores" in ablate:
                s_src = jnp.zeros((nh8, eb), jnp.float32)
                s_dst_e = jnp.zeros((nh8, eb), jnp.float32)
            else:
                s_src = jax.lax.dot_general(
                    a_src_t[:pair], h_sel, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)     # (NH8, EB)
                s_dst_e = jax.lax.dot_general(
                    s_dst_ref[:], onehot_dst, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
            col = start + jax.lax.broadcasted_iota(jnp.int32, (1, eb), 1)
            return (meta, recv_row, onehot_dst, onehot_w, s_src,
                    s_dst_e, col, h_sel)
        if "onehot" in ablate:
            onehot_dst = jnp.full((nb, eb), 1e-3, jnp.float32)
            onehot_w = jnp.full((wn, eb), 1e-3, jnp.float32)
        elif v7:
            onehot_dst = ((recv_row - (ti * nb).astype(jnp.float32))
                          == rows_nb_f).astype(jnp.float32)  # (NB, EB)
            onehot_w = ((src_row - wrow0)
                        == rows_wb_f).astype(jnp.float32)    # (WN, EB)
        else:
            rows = (ti * nb
                    + jax.lax.broadcasted_iota(jnp.int32, (nb, eb), 0)
                    ).astype(jnp.float32)
            onehot_dst = (recv_row == rows).astype(jnp.float32)  # (NB, EB)
            wrow = (wrow0
                    + jax.lax.broadcasted_iota(jnp.int32, (wn, eb), 0
                                               ).astype(jnp.float32))
            onehot_w = (src_row == wrow).astype(jnp.float32)     # (WN, EB)
        if "scores" in ablate:
            s_src = jnp.zeros((nh8, eb), jnp.float32)
            s_dst_e = jnp.zeros((nh8, eb), jnp.float32)
        else:
            s_src = jax.lax.dot_general(
                ss_win, onehot_w, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)              # (NH8, EB)
            s_dst_e = jax.lax.dot_general(
                s_dst_ref[:], onehot_dst, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)              # (NH8, EB)
        col = start + jax.lax.broadcasted_iota(jnp.int32, (1, eb), 1)
        return (meta, recv_row, onehot_dst, onehot_w, s_src, s_dst_e,
                col, wt_blk)

    def cap_body(b, carry):
        vmax, vcode = carry
        if v7:
            g = lo // eb + b          # GLOBAL block id (eb-aligned tiles)
            gg = g // dmak
            j = g - gg * dmak
            slotg = jax.lax.rem(gg, 2)
            joff = pl.multiple_of(j * eb, eb)
            if dm_on:
                @pl.when(j == 0)
                def _():
                    # bootstrap: the very first global block starts its
                    # own group's read (everything later is prefetched
                    # one group ahead, across tile boundaries)
                    @pl.when(g == 0)
                    def _():
                        dma_mg(0).start()

                    @pl.when(gg + 1 < ng_total)
                    def _():
                        dma_mg(gg + 1).start()

                    # before staging into cbuf slot gg%2, its previous
                    # combined write (group gg-2) must have landed
                    @pl.when(gg >= 2)
                    def _():
                        dma_cw(gg - 2).wait()
                        if gstream:
                            dma_gw(gg - 2).wait()

                    dma_mg(gg).wait()
            meta_v = mbuf[slotg, :, pl.ds(joff, eb)]
        else:
            slot = b % 2

            @pl.when(b + 1 < nblocks)
            def _():
                dma_m((b + 1) % 2, b + 1).start()

            dma_m(slot, b).wait()
            meta_v = mbuf[slot]
        start = pl.multiple_of(lo + b * eb, eb)
        (meta, recv_row, onehot_dst, onehot_w, s_src, s_dst_e,
         col, _wsl) = edge_inputs(meta_v, b)
        raw = s_src + s_dst_e
        if v7 and dm_on:
            # v8: persist this block's meta+raw as ONE combined stream
            # for phase 1 / backward, flushed once per GLOBAL group (the
            # last global group flushes at the last real block; staging
            # can span tile boundaries — VMEM scratch persists across
            # the sequential grid)
            cbuf[slotg, 0:mr, pl.ds(joff, eb)] = meta
            cbuf[slotg, mr:mr + nh8, pl.ds(joff, eb)] = raw

            @pl.when((j == dmak - 1) | (g == g_total - 1))
            def _():
                dma_cw(gg).start()
        head = jax.lax.broadcasted_iota(jnp.int32, (nh8, eb), 0)
        in_tile = ((recv_row >= ti * nb) & (recv_row < ti * nb + nb))
        valid = (head < nh) & (col < e_real) & in_tile
        masked = jnp.where(valid, raw, NEG_INF)
        code = col * nh8 + head
        bm = jnp.max(masked)
        bcode = jnp.min(jnp.where(masked == bm, code, _I32_MAX))
        tie = jnp.where(bm == vmax, jnp.minimum(bcode, vcode), vcode)

        if sweep1:
            # single-sweep attention accumulation (see kernel docstring):
            # raw is already B-shifted (<= 0 at the true max), LeakyReLU
            # collapsed to its negative branch, normalisation deferred
            # to the XLA epilogue — the acc output is UNNORMALISED
            # [num | den]. dt one-hots come from CASTS of the f32 ones
            # edge_inputs built for the score matmuls (1 VPU op vs a
            # fresh iota+cmp+select build).
            dt = _v6_dtype()
            ex = jnp.exp(slope * raw)
            ex = jnp.where(col < e_real, ex, 0.0)           # (NH8, EB)
            if pair:
                # v12: edge_inputs already gathered + slot-selected
                gathered_t = _wsl                           # (PAIR, EB)
            elif "gather" in ablate:
                gathered_t = jnp.zeros((nhfl, eb), jnp.float32)
            else:
                gathered_t = jax.lax.dot_general(
                    _wsl.astype(dt), onehot_w.astype(_onehot_dtype()),
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)     # (NHFL, EB)
            h_t = gathered_t[:nhf8]
            num_t = ex
            if with_dropout:
                num_t = num_t * meta[0:nh8, :]
            if "expander" in ablate:
                num_wide = jnp.zeros((nhf8, eb), jnp.float32)
            else:
                num_wide = jax.lax.dot_general(
                    expander, num_t, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)     # (NHF8, EB)
            weighted_t = h_t * num_wide
            combined = jnp.concatenate([weighted_t, ex], axis=0
                                       ).astype(dt)
            if "accdot" not in ablate:
                acc_ref[:] += jax.lax.dot_general(
                    combined, onehot_dst.astype(_onehot_dtype()),
                    (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)  # (NHF8+NH8, NB)
            if gstream and dm_on:
                # v11: persist the gathered rows for the backward. The
                # bf16 cast is EXACT — a one-hot gather of bf16 inputs
                # produces bf16-representable f32 values.
                gbuf[slotg, :, pl.ds(joff, eb)] = gathered_t.astype(
                    jnp.bfloat16)

                @pl.when((j == dmak - 1) | (g == g_total - 1))
                def _():
                    dma_gw(gg).start()

        return (jnp.maximum(vmax, bm),
                jnp.where(bm > vmax, bcode, tie))

    def main_body(b, _):
        slot = b % 2

        @pl.when(b + 1 < nblocks)
        def _():
            dma_m((b + 1) % 2, b + 1).start()

        dma_m(slot, b).wait()
        start = pl.multiple_of(lo + b * eb, eb)
        (meta, recv_row, onehot_dst, onehot_w, s_src, s_dst_e,
         col, wt_blk) = edge_inputs(mbuf[slot], b)
        cap = jnp.max(capacc[:])
        pre = (s_src + s_dst_e) - cap
        lgt = jnp.where(pre > 0.0, pre, slope * pre)
        ex = jnp.exp(lgt)
        ex = jnp.where(col < e_real, ex, 0.0)               # (NH8, EB)

        dt = _v6_dtype()
        if "gather" in ablate:
            gathered_t = jnp.zeros((nhfl, eb), jnp.float32)
        else:
            gathered_t = jax.lax.dot_general(
                wt_blk.astype(dt), onehot_w.astype(dt),
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)         # (NHFL, EB)
        h_t = gathered_t[:nhf8]

        num_t = ex
        if with_dropout:
            num_t = num_t * meta[0:nh8, :]
        num_wide = jax.lax.dot_general(
            expander, num_t, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)             # (NHF8, EB)
        weighted_t = h_t * num_wide
        combined = jnp.concatenate([weighted_t, ex], axis=0).astype(dt)
        acc_ref[:] += jax.lax.dot_general(
            combined, onehot_dst.astype(dt), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)     # (NHF8+NH8, NB)
        return 0

    def main_body_v7(b, _):
        # v8 main phase: the combined meta+raw stream written by phase 0
        # arrives in GLOBAL dmak-block groups — no score matmuls,
        # one-hots built once directly in the contraction dtype, and the
        # one-group prefetch distance survives tile boundaries
        g = lo // eb + b
        gg = g // dmak
        j = g - gg * dmak
        slotg = jax.lax.rem(gg, 2)
        joff = pl.multiple_of(j * eb, eb)
        if dm_on:
            @pl.when(j == 0)
            def _():
                @pl.when(g == 0)
                def _():
                    dma_cr(0).start()

                @pl.when(gg + 1 < ng_total)
                def _():
                    dma_cr(gg + 1).start()

                dma_cr(gg).wait()
        start = pl.multiple_of(lo + b * eb, eb)
        meta = cbuf[slotg, 0:mr, pl.ds(joff, eb)]
        raw = cbuf[slotg, mr:mr + nh8, pl.ds(joff, eb)]
        recv_at = nh8 if with_dropout else 0
        recv_row = meta[recv_at:recv_at + 1, :]             # (1, EB)
        src_row = meta[recv_at + 1:recv_at + 2, :]          # (1, EB)
        wt_blk, _ss, wrow0, wn = block_window(b, need_scores=False)
        dt = _v6_dtype()
        if "onehot" in ablate:
            onehot_dst_dt = jnp.full((nb, eb), 1e-3, dt)
            onehot_w_dt = jnp.full((wn, eb), 1e-3, dt)
        else:
            onehot_dst_dt = ((recv_row - (ti * nb).astype(jnp.float32))
                             == rows_nb_f).astype(dt)        # (NB, EB)
            onehot_w_dt = ((src_row - wrow0)
                           == rows_wb_f).astype(dt)          # (WN, EB)
        cap = jnp.max(capacc[:])
        pre = raw - cap
        lgt = jnp.where(pre > 0.0, pre, slope * pre)
        ex = lgt if "exp" in ablate else jnp.exp(lgt)
        col = start + jax.lax.broadcasted_iota(jnp.int32, (1, eb), 1)
        ex = jnp.where(col < e_real, ex, 0.0)               # (NH8, EB)

        if "gather" in ablate:
            gathered_t = jnp.zeros((nhfl, eb), jnp.float32)
        else:
            gathered_t = jax.lax.dot_general(
                wt_blk.astype(dt), onehot_w_dt,
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)         # (NHFL, EB)
        h_t = gathered_t[:nhf8]

        num_t = ex
        if with_dropout:
            num_t = num_t * meta[0:nh8, :]
        if "expander" in ablate:
            num_wide = jnp.zeros((nhf8, eb), jnp.float32)
        else:
            num_wide = jax.lax.dot_general(
                expander, num_t, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)         # (NHF8, EB)
        weighted_t = h_t * num_wide
        combined = jnp.concatenate([weighted_t, ex], axis=0).astype(dt)
        if "accdot" not in ablate:
            acc_ref[:] += jax.lax.dot_general(
                combined, onehot_dst_dt, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)  # (NHF8+NH8, NB)
        return 0

    def _phase0():
        if sweep1:
            acc_ref[:] = jnp.zeros_like(acc_ref)
            nb_cap = nblocks          # merged sweep can't skip blocks
        else:
            nb_cap = jnp.int32(0) if "cap" in ablate else nblocks
        vmax, vcode = jax.lax.fori_loop(
            0, nb_cap, cap_body,
            (jnp.float32(NEG_INF), _I32_MAX * jnp.int32(1)))
        if v7 and ("cap" not in ablate or sweep1) and dm_on:
            # drain the in-flight combined-stream writes ONCE, at the end
            # of the LAST phase-0 tile (phase 1 reads the same HBM ref,
            # and the sequential grid orders this drain before any read).
            # Groups are global, so at most the last two are in flight.
            @pl.when(ti == t - 1)
            def _():
                @pl.when(ng_total >= 2)
                def _():
                    dma_cw(ng_total - 2).wait()
                    if gstream:
                        dma_gw(ng_total - 2).wait()

                @pl.when(ng_total >= 1)
                def _():
                    dma_cw(ng_total - 1).wait()
                    if gstream:
                        dma_gw(ng_total - 1).wait()
        # fold this tile's (max, code) into the persistent accumulators
        old = capacc[0, 0]
        oldc = codeacc[0, 0]
        newc = jnp.where(vmax > old, vcode,
                         jnp.where(vmax == old,
                                   jnp.minimum(vcode, oldc), oldc))
        slot00 = ((jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0) == 0)
                  & (jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
                     == 0))
        capacc[:] = jnp.where(slot00, jnp.maximum(old, vmax), NEG_INF)
        codeacc[:] = jnp.where(slot00, newc, _I32_MAX)

    def _phase1():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        jax.lax.fori_loop(0, nblocks, main_body_v7 if v7 else main_body,
                          0)
        d = acc_ref[nhf8:, :]
        inv = jnp.where(d > 0.0, 1.0 / (d + eps), 0.0)
        inv_wide = jax.lax.dot_general(
            expander, inv, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        acc_ref[:nhf8, :] = acc_ref[:nhf8, :] * inv_wide

    if sweep1:
        _phase0()                     # merged: acc is UNNORMALISED
    else:
        pl.when(phase == 0)(_phase0)
        pl.when(phase == 1)(_phase1)

    cap_ref[:] = capacc[:]
    code_ref[:] = codeacc[:]


def _pack_meta_v6(drop_mask, receivers, senders, nh8, pad_cols):
    """(MR, E+pad_cols) edge-major: optional dropout rows (NH8), then one
    8-row group with receiver ids at subrow 0 and sender ids at subrow 1
    (f32, exact below 2^24). pad_cols covers the stream's block (legacy)
    or group (v7: dmak*eb) overhang."""
    parts = []
    if drop_mask is not None:
        dm = drop_mask.T
        if dm.shape[0] != nh8:
            dm = jnp.pad(dm, ((0, nh8 - dm.shape[0]), (0, 0)))
        parts.append(dm)
    parts.append(receivers.astype(jnp.float32)[None, :])
    parts.append(senders.astype(jnp.float32)[None, :])
    meta = jnp.concatenate(parts, axis=0)
    mr = (nh8 if drop_mask is not None else 0) + 8
    return jnp.pad(meta, ((0, mr - meta.shape[0]), (0, pad_cols)))


def _v6_prep(h_flat, a_src, senders, receivers, tile_lo, num_nodes,
             nh, f, eb, nb, window):
    """Pads the node table, derives per-NB-tile window bases from the
    128-granule tile_lo metadata, and packs scalar-prefetch operands."""
    nhf = nh * f
    nh8 = _round_up(nh, 8)
    nhfl = _round_up(nhf, 128)
    h8 = h_flat if nhf == nhfl else jnp.pad(
        h_flat, ((0, 0), (0, nhfl - nhf)))
    n_rows = h8.shape[0]
    if n_rows < window:
        h8 = jnp.pad(h8, ((0, window - n_rows), (0, 0)))
        n_rows = window
    a_pad = jnp.pad(a_src, ((0, nhfl - a_src.shape[0]),
                            (0, nh8 - a_src.shape[1])))

    t = pl.cdiv(num_nodes, nb)
    k = nb // 128
    tl = tile_lo.astype(jnp.int32)
    need = t * k
    if tl.shape[0] < need:
        tl = jnp.pad(tl, (0, need - tl.shape[0]),
                     constant_values=_I32_MAX)
    lo_nb = jnp.min(tl[:need].reshape(t, k), axis=1)        # (T,)
    base = jnp.minimum(jnp.maximum((lo_nb // 8) * 8, 0), n_rows - window)
    return h8, a_pad, base.astype(jnp.int32), nh8, nhfl, n_rows


def _forward_v6(h8, meta, a_pad, s_dst, base, receivers, e_real,
                num_nodes, nh, f, *, eps, slope, eb, nb, window,
                interpret, with_dropout, block_base=None, tile_ptr=None,
                wb=0, sweep1=False, gstream=False, pair=0):
    dmak = _dmak()
    t = pl.cdiv(num_nodes, nb)
    n_pad = t * nb
    nh8 = _round_up(nh, 8)
    nhf8 = _round_up(nh * f, 8)
    nhfl = h8.shape[1]
    gprows = pair or nhfl              # gathered-payload stream rows
    resident = window == h8.shape[0]   # whole table in VMEM, one DMA

    s_dst_t = jnp.pad(s_dst.T, ((0, nh8 - nh), (0, n_pad - num_nodes)))
    if tile_ptr is not None:           # v7: eb-aligned offsets from prep
        tile_off = tile_ptr.astype(jnp.int32)
        bbase = block_base.astype(jnp.int32)
    else:
        bounds = jnp.arange(t + 1, dtype=jnp.int32) * nb
        tile_off = jnp.searchsorted(receivers, bounds, side="left"
                                    ).astype(jnp.int32)
        bbase = jnp.zeros((1,), jnp.int32)
    pref = jnp.concatenate([tile_off, e_real[None].astype(jnp.int32)])

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(t,) if sweep1 else (2 * t,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),   # h8
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),   # meta
            pl.BlockSpec((nhfl, nh8), lambda i, *_: (0, 0),
                         memory_space=pltpu.VMEM),              # a_pad
            pl.BlockSpec((nh8, nb), lambda i, *_: (0, jax.lax.rem(i, t)),
                         memory_space=pltpu.VMEM),              # s_dst_t
        ],
        out_specs=[
            pl.BlockSpec((nhf8 + nh8, nb),
                         lambda i, *_: (0, jax.lax.rem(i, t)),
                         memory_space=pltpu.VMEM),              # acc
            pl.BlockSpec((8, 128), lambda i, *_: (0, 0),
                         memory_space=pltpu.VMEM),              # cap
            pl.BlockSpec((8, 128), lambda i, *_: (0, 0),
                         memory_space=pltpu.VMEM),              # code
        ] + ([pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM)]  # comb
             if wb else [])
          + ([pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM)]  # gpay
             if gstream else []),
        scratch_shapes=[
            pltpu.VMEM((1 if resident else 2, window, nhfl),
                       h8.dtype),                               # wbuf
            pltpu.VMEM((2, meta.shape[0], dmak * eb if wb else eb),
                       jnp.float32),                            # mbuf
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.VMEM((8, 128), jnp.float32),                  # capacc
            pltpu.VMEM((8, 128), jnp.int32),                    # codeacc
        ] + ([pltpu.VMEM((2, meta.shape[0] + nh8, dmak * eb),
                         jnp.float32),                          # cbuf
              pltpu.SemaphoreType.DMA((2,))] if wb else [])
          + ([pltpu.VMEM((2, gprows, dmak * eb), jnp.bfloat16),  # gbuf
              pltpu.SemaphoreType.DMA((2,))] if gstream else []),
    )
    kernel = functools.partial(
        _kernel_v6, eb=eb, nb=nb, nh=nh, f=f, nh8=nh8, nhf8=nhf8,
        nhfl=nhfl, w=window, eps=eps, slope=slope,
        with_dropout=with_dropout, resident=resident, wb=wb,
        dmak=dmak, ablate=_ablate(), sweep1=sweep1, gstream=gstream,
        pair=pair)
    e = receivers.shape[0]
    outs = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((nhf8 + nh8, n_pad), jnp.float32),
            jax.ShapeDtypeStruct((8, 128), jnp.float32),
            jax.ShapeDtypeStruct((8, 128), jnp.int32),
        ] + ([jax.ShapeDtypeStruct((meta.shape[0] + nh8, meta.shape[1]),
                                   jnp.float32)]                # comb
             if wb else [])
          + ([jax.ShapeDtypeStruct((gprows, meta.shape[1]),
                                   jnp.bfloat16)]               # gpay
             if gstream else []),
        cost_estimate=pl.CostEstimate(
            flops=2 * (e + eb) * (2 * (wb or window) * nh8
                                  + (wb or window) * nhfl
                                  + 2 * nb * (nhf8 + nh8)),
            bytes_accessed=(1 if resident else (t if sweep1 else 2 * t))
            * window * nhfl * 4
            + (2 + (2 if wb else 0)) * (e + eb) * meta.shape[0] * 4
            + n_pad * (nhf8 + nh8) * 4,
            transcendentals=(e + eb) * nh8),
        interpret=interpret,
    )(pref, base, bbase, h8, meta, a_pad, s_dst_t)
    acc_t, cap_o, code_o = outs[:3]
    comb = outs[3] if wb else None
    gpay = outs[4] if gstream else None
    return (acc_t[:nh * f].T[:num_nodes],
            acc_t[nhf8:nhf8 + nh].T[:num_nodes],
            cap_o[0, 0], code_o[0, 0], comb, gpay)


def _kernel_v6_bwd(tile_off_ref,    # (T+2,) int32: offsets | e_real
                   base_ref,        # (T,) int32
                   bbase_ref,       # (G,) int32 per-block base (v7) / dummy
                   h_hbm,           # (N_rows, NHFL)
                   meta_hbm,        # (MR, E_cols)
                   zeros_h_hbm,     # (N_rows, NHFL) aliased -> d_table
                   zeros_m_hbm,     # (NH8, E_cols) aliased -> d_drop
                   g_t, out_t, denom_t,    # (nhf8|nh8, NB) per tile
                   s_dst_ref,              # (NH8, NB) per tile
                   a_src_ref,              # (NHFL, NH8) whole
                   cap_sref,               # (1, 1) SMEM
                   *rest,
                   eb: int, nb: int, nh: int, f: int, nh8: int,
                   nhf8: int, nhfl: int, w: int, eps: float,
                   slope: float, with_dropout: bool, resident: bool,
                   wb: int = 0, dmax: int = -1, dmak: int = 4,
                   ablate: frozenset = frozenset(),
                   sweep1: bool = False, gstream: bool = False,
                   normalize: bool = True, pair: int = 0):
    v7 = wb > 0                       # block-local windows (see _kernel_v6)
    sliding = dmax >= 0               # sliding d(h) accumulator (v7 only)
    # v7 runs the v8 raw-score pipeline: the forward saved a COMBINED
    # meta+raw stream which arrives here in dmak-block groups — no score
    # matmuls, no separate meta stream, no f32 onehot_w (see
    # _kernel_v6). rest = [comb_hbm?] + outputs + scratch + [cbuf/sems?]
    # + [stage?]
    gpay_hbm = gbuf = gsems = None
    if v7 and gstream:
        (comb_hbm, gpay_hbm, dtab_hbm, dmeta_hbm, dsdst_ref, dasrc_ref,
         dcap_ref, wbuf, mbuf, dwin, dmbuf, rwin, rmbuf, sems, msems,
         wsems, rsems, cbuf, rawsems, gbuf, gsems, *opt) = rest
        stage = opt[0] if opt else None
    elif v7:
        (comb_hbm, dtab_hbm, dmeta_hbm, dsdst_ref, dasrc_ref, dcap_ref,
         wbuf, mbuf, dwin, dmbuf, rwin, rmbuf, sems, msems, wsems,
         rsems, cbuf, rawsems, *opt) = rest
        stage = opt[0] if opt else None
    else:
        comb_hbm = cbuf = rawsems = stage = None
        (dtab_hbm, dmeta_hbm, dsdst_ref, dasrc_ref, dcap_ref,
         wbuf, mbuf, dwin, dmbuf, rwin, rmbuf, sems, msems, wsems,
         rsems) = rest
    mr = (nh8 if with_dropout else 0) + 8   # meta rows (_pack_meta_v6)
    i = pl.program_id(0)
    t = pl.num_programs(0)
    if v7:
        lo = tile_off_ref[i]          # eb-aligned: no shared overlap block
    else:
        lo = (tile_off_ref[i] // eb) * eb
    hi = tile_off_ref[i + 1]
    e_real = tile_off_ref[t + 1]
    nblocks = pl.cdiv(hi - lo, eb)

    expander = _expander(nh8, nhf8, nh, f)
    a_src_t = a_src_ref[:].astype(jnp.float32)
    # sweep1 (v10): the SMEM scalar holds eps' = eps*exp(slope*cap')
    # (the epilogue's effective denominator eps — see _kernel_v6) and
    # the comb stream's raw is already B-shifted; legacy: it holds cap.
    cap = cap_sref[0, 0]
    dsdst_ref[:] = jnp.zeros_like(dsdst_ref)

    @pl.when(i == 0)
    def _():
        dasrc_ref[:] = jnp.zeros_like(dasrc_ref)
        dcap_ref[:] = jnp.zeros_like(dcap_ref)

    # normalised op: inv_d = 1/(denom+eps_eff), d_den = -(out.g)_h*inv_d
    # partial op (normalize=False, the sharded parts VJP): inv_d = 1 and
    # denom_t carries the INCOMING d_den cotangent; out_t is unused —
    # same convention as segment_attention_bwd.backward_packed
    d = denom_t[:]
    if normalize:
        eps_eff = cap if sweep1 else eps
        inv_d = jnp.where(d > 0.0, 1.0 / (d + eps_eff), 0.0)
        outg_h = jax.lax.dot_general(
            expander, out_t[:] * g_t[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        d_den = -outg_h * inv_d
    else:
        inv_d = jnp.ones_like(d)
        d_den = d
    # loop-invariant: hoisted out of the per-block body (Mosaic does
    # not hoist out of fori_loop bodies; the concat is a copy pass)
    payload_tile = jnp.concatenate([g_t[:], inv_d, d_den], axis=0)
    dt_pay = _v6_dtype()
    payload_tile_dt = payload_tile.astype(dt_pay)

    dm_on = "dmam" not in ablate
    dw_on = "dmaw" not in ablate

    if not dw_on or gstream:
        # gstream (v11): the gathered payloads arrive from the forward's
        # stream — the backward never reads the node table at all
        pass
    elif resident:
        # whole-table window: one DMA in, d(h) accumulated fully in VMEM
        # and written back ONCE at the last tile (no per-tile readback)
        @pl.when(i == 0)
        def _():
            cp = pltpu.make_async_copy(h_hbm.at[pl.ds(0, w), :],
                                       wbuf.at[0], sems.at[0])
            cp.start()
            cp.wait()
    else:
        def dma_w(slot, gi):
            base_g = pl.multiple_of((base_ref[gi] // 8) * 8, 8)
            return pltpu.make_async_copy(h_hbm.at[pl.ds(base_g, w), :],
                                         wbuf.at[slot], sems.at[slot])

        @pl.when(i == 0)
        def _():
            dma_w(0, 0).start()

        @pl.when(i + 1 < t)
        def _():
            dma_w((i + 1) % 2, i + 1).start()

        dma_w(i % 2, i).wait()
    wslot_ix = 0 if resident else jax.lax.rem(i, 2)
    if v7:
        win_t = s_src_win = None      # per-block slices instead
    else:
        win_t = wbuf[wslot_ix].astype(jnp.float32).T        # (NHFL, W)
        if "scores" in ablate:
            s_src_win = jnp.zeros((nh8, w), jnp.float32)
        else:
            s_src_win = jax.lax.dot_general(
                a_src_t, win_t, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)         # (NH8, W)
    base = pl.multiple_of((base_ref[i] // 8) * 8, 8)
    base_f = base.astype(jnp.float32)

    if v7:
        # hoisted one-hot row iotas (see _kernel_v6)
        rows_nb_f = jax.lax.broadcasted_iota(
            jnp.int32, (nb, eb), 0).astype(jnp.float32)
        rows_wb_f = jax.lax.broadcasted_iota(
            jnp.int32, (wb, eb), 0).astype(jnp.float32)

    def block_window(b, need_scores=True):
        """Block-local sub-window of the wbuf REF (v7) or the whole tile
        window — see _kernel_v6.block_window. Also returns the slice
        offset for the dwin scatter."""
        if not v7:
            return win_t, s_src_win, base_f, w, jnp.int32(0)
        goff = lo // eb + b
        off = jnp.minimum(jnp.maximum(bbase_ref[goff] - base, 0), w - wb)
        off = pl.multiple_of((off // 8) * 8, 8)
        if "winT" in ablate:
            blk_t = jnp.full((nhfl, wb), 1e-3, jnp.float32)
        else:
            blk_t = wbuf[wslot_ix, pl.ds(off, wb), :
                         ].astype(jnp.float32).T
        if not need_scores:
            s_src_blk = None
        elif "scores" in ablate:
            s_src_blk = jnp.zeros((nh8, wb), jnp.float32)
        else:
            s_src_blk = jax.lax.dot_general(
                a_src_t, blk_t, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)          # (NH8, WB)
        return blk_t, s_src_blk, (base + off).astype(jnp.float32), wb, off

    if resident or sliding:
        # persistent accumulator: zeroed once, carried across tiles
        # (sliding keeps the [w, w+dmax) slack rows zero as an invariant)
        @pl.when(i == 0)
        def _():
            dwin[:] = jnp.zeros_like(dwin)
    else:
        dwin[:] = jnp.zeros_like(dwin)

    def dma_m(slot, b):
        start = pl.multiple_of(lo + b * eb, eb)
        return pltpu.make_async_copy(meta_hbm.at[:, pl.ds(start, eb)],
                                     mbuf.at[slot], msems.at[slot])

    def dma_wm(slot, b):
        start = pl.multiple_of(lo + b * eb, eb)
        return pltpu.make_async_copy(dmbuf.at[slot],
                                     dmeta_hbm.at[:, pl.ds(start, eb)],
                                     wsems.at[slot])

    if v7:
        # GLOBAL combined-stream groups (same geometry as _kernel_v6:
        # eb-aligned tiles -> globally contiguous blocks; the per-tile
        # bootstrap read exposed one DMA latency at every tile entry)
        geb = dmak * eb
        g_total = tile_off_ref[t] // eb
        ng_total = pl.cdiv(g_total, dmak)

        def dma_cr(gg):
            # combined meta+raw group read (see _kernel_v6)
            start = pl.multiple_of(gg * geb, eb)
            return pltpu.make_async_copy(
                comb_hbm.at[:, pl.ds(start, geb)], cbuf.at[gg % 2],
                rawsems.at[gg % 2])

        def dma_gr(gg):
            # gathered-payload group read (v11)
            start = pl.multiple_of(gg * geb, eb)
            return pltpu.make_async_copy(
                gpay_hbm.at[:, pl.ds(start, geb)], gbuf.at[gg % 2],
                gsems.at[gg % 2])
    else:
        @pl.when(nblocks > 0)
        def _():
            dma_m(0, 0).start()

    def body(b, _):
        slot = b % 2
        wslot = b % 2

        if v7:
            g = lo // eb + b          # GLOBAL block id
            gg = g // dmak
            j = g - gg * dmak
            slotg = jax.lax.rem(gg, 2)
            joff = pl.multiple_of(j * eb, eb)
            if dm_on:
                @pl.when(j == 0)
                def _():
                    @pl.when(g == 0)
                    def _():
                        dma_cr(0).start()
                        if gstream:
                            dma_gr(0).start()

                    @pl.when(gg + 1 < ng_total)
                    def _():
                        dma_cr(gg + 1).start()
                        if gstream:
                            dma_gr(gg + 1).start()

                    dma_cr(gg).wait()
                    if gstream:
                        dma_gr(gg).wait()
            meta = cbuf[slotg, 0:mr, pl.ds(joff, eb)]
            raw = cbuf[slotg, mr:mr + nh8, pl.ds(joff, eb)]
        else:
            @pl.when(b + 1 < nblocks)
            def _():
                dma_m((b + 1) % 2, b + 1).start()

            dma_m(slot, b).wait()
            meta = mbuf[slot]

        if dm_on and with_dropout:
            # pipelined d_drop writes: only wait for the write issued
            # two blocks ago before reusing its buffer slot (in-tile
            # writes are disjoint; the cross-tile overlap block is
            # covered by the post-loop drain)
            @pl.when(b >= 2)
            def _():
                dma_wm(wslot, b - 2).wait()
        start = pl.multiple_of(lo + b * eb, eb)
        recv_at = nh8 if with_dropout else 0
        recv_row = meta[recv_at:recv_at + 1, :]
        src_row = meta[recv_at + 1:recv_at + 2, :]
        dt = _v6_dtype()
        if gstream:
            # v11: no wbuf — the gathered payload arrives streamed; only
            # the dwin slice offset (and the one-hot row origin for the
            # SCATTER) are needed from the layout metadata
            goff_w = lo // eb + b
            woff = jnp.minimum(jnp.maximum(bbase_ref[goff_w] - base, 0),
                               w - wb)
            woff = pl.multiple_of((woff // 8) * 8, 8)
            wt_blk, ss_win = None, None
            wrow0 = (base + woff).astype(jnp.float32)
            wn = wb
        else:
            wt_blk, ss_win, wrow0, wn, woff = block_window(
                b, need_scores=not v7)
        if pair:
            # v12: window rows are 128//pair-node PACKS (see
            # _kernel_v6.edge_inputs pair path); sub is needed by the
            # slot selection/packing even under one-hot ablation
            npack = 128 // pair
            src_pk = jnp.floor(src_row * (1.0 / npack))
            sub = src_row - src_pk * npack                   # (1, EB)
        if "onehot" in ablate:
            onehot_dst = jnp.full((nb, eb), 1e-3,
                                  dt if v7 else jnp.float32)
            onehot_w_dt = jnp.full((wn, eb), 1e-3, dt)
            onehot_w = None if v7 else jnp.full((wn, eb), 1e-3,
                                                jnp.float32)
        elif v7:
            # both one-hots are built ONCE, directly in the contraction
            # dtype — the f32 instances only existed for the score
            # matmuls, which the raw stream replaces; payload and dsdst
            # run at dt with f32 accumulation (exact in f32 mode)
            odt = _onehot_dtype()
            onehot_dst = ((recv_row - (i * nb).astype(jnp.float32))
                          == rows_nb_f).astype(odt)          # (NB, EB)
            if pair:
                onehot_w_dt = ((src_pk - wrow0)
                               == rows_wb_f).astype(odt)     # (WN, EB)
            else:
                onehot_w_dt = ((src_row - wrow0)
                               == rows_wb_f).astype(odt)     # (WN, EB)
            onehot_w = None
        else:
            rows = (i * nb
                    + jax.lax.broadcasted_iota(jnp.int32, (nb, eb), 0)
                    ).astype(jnp.float32)
            onehot_dst = (recv_row == rows).astype(jnp.float32)  # (NB, EB)
            wrow = (wrow0
                    + jax.lax.broadcasted_iota(jnp.int32, (wn, eb), 0
                                               ).astype(jnp.float32))
            onehot_w = (src_row == wrow).astype(jnp.float32)     # (WN, EB)
            onehot_w_dt = onehot_w.astype(dt)

        if v7 and sweep1:
            pre = raw                 # B-shifted raw; lgt = slope*pre
        elif v7:
            pre = raw - cap
        else:
            if "scores" in ablate:
                s_src = jnp.zeros((nh8, eb), jnp.float32)
                s_dst_e = jnp.zeros((nh8, eb), jnp.float32)
            else:
                s_src = jax.lax.dot_general(
                    ss_win, onehot_w, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                s_dst_e = jax.lax.dot_general(
                    s_dst_ref[:], onehot_dst, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
            pre = (s_src + s_dst_e) - cap
        lgt = slope * pre if sweep1 else jnp.where(
            pre > 0.0, pre, slope * pre)
        ex = lgt if "exp" in ablate else jnp.exp(lgt)
        col = start + jax.lax.broadcasted_iota(jnp.int32, (1, eb), 1)
        in_range = col < e_real
        ex = jnp.where(in_range, ex, 0.0)

        if "gather" in ablate:
            gathered_t = jnp.zeros((pair or nhfl, eb), jnp.float32)
        elif gstream:
            # v11 stream already carries the slot-selected rows when
            # pair (the forward wrote h_sel)
            gathered_t = gbuf[slotg, :, pl.ds(joff, eb)
                              ].astype(jnp.float32)   # (PAIR|NHFL, EB)
        else:
            gathered_t = jax.lax.dot_general(
                wt_blk.astype(dt), onehot_w_dt,
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)         # (NHFL, EB)
            if pair:
                sel = None
                for k in range(128 // pair):
                    mk_ = (sub == float(k)).astype(jnp.float32)
                    piece = gathered_t[k * pair:(k + 1) * pair, :] * mk_
                    sel = piece if sel is None else sel + piece
                gathered_t = sel                             # (PAIR, EB)
        h_t = gathered_t[:nhf8]

        payload = payload_tile
        if "payload" in ablate:
            payload_e = jnp.zeros((payload.shape[0], eb), jnp.float32)
        elif v7:
            # contraction-dtype payload gather: the one-hot is exact in
            # bf16 and the gathered g/inv_d/d_den rows feed gradient
            # chains that already run at dt precision (gathered h, d(h)
            # scatter, dasrc) — f32 mode (GAT_TPU_V6_DTYPE=float32) is
            # unchanged. f32 payload matmuls measured ~7 ms of the
            # banded 5M step (docs/PERF.md round-2-resume ablations).
            payload_e = jax.lax.dot_general(
                payload_tile_dt, onehot_dst,
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        else:
            payload_e = jax.lax.dot_general(
                payload, onehot_dst, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        g_e = payload_e[0:nhf8, :]
        invd_e = payload_e[nhf8:nhf8 + nh8, :]
        dden_e = payload_e[nhf8 + nh8:nhf8 + 2 * nh8, :]

        m = meta[0:nh8, :] if with_dropout else None

        coef = ex * invd_e if m is None else ex * m * invd_e
        if "expander" in ablate:
            coef_wide = jnp.zeros((nhf8, eb), jnp.float32)
            hdotg = jnp.zeros((nh8, eb), jnp.float32)
        else:
            coef_wide = jax.lax.dot_general(
                expander, coef, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            hdotg = jax.lax.dot_general(
                expander, h_t * g_e, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        d_h_feat = coef_wide * g_e                          # (NHF8, EB)
        d_ex = hdotg * invd_e
        if m is not None:
            d_ex = d_ex * m
        d_lg = ex * (d_ex + dden_e)
        d_pre = slope * d_lg if sweep1 else jnp.where(
            pre > 0.0, d_lg, slope * d_lg)
        d_raw = jnp.where(in_range, d_pre, 0.0)             # (NH8, EB)

        if pair:
            d_h_att = jax.lax.dot_general(
                a_src_t[:pair], d_raw, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)         # (PAIR, EB)
            if nhf8 == pair:
                d_h_sel = d_h_att + d_h_feat
            else:
                d_h_sel = jnp.concatenate(
                    [d_h_att[:nhf8] + d_h_feat, d_h_att[nhf8:]], axis=0)
            # re-pack the selected cotangent into the slot its node
            # occupies (the scatter's transpose of the slot selection)
            d_h_full = jnp.concatenate(
                [d_h_sel * (sub == float(k)).astype(jnp.float32)
                 for k in range(128 // pair)], axis=0)       # (128, EB)
        else:
            d_h_att = jax.lax.dot_general(
                a_src_t, d_raw, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)         # (NHFL, EB)
            if nhf8 == nhfl:
                d_h_full = d_h_att + d_h_feat
            else:
                d_h_full = jnp.concatenate(
                    [d_h_att[:nhf8] + d_h_feat, d_h_att[nhf8:]], axis=0)

        # d(h) scattered into the WINDOW accumulator — the one-hot's
        # transpose is the scatter (no permute, no sorted-segment pass).
        # v7 accumulates into the block's wb-row sub-slice of dwin.
        if "scatter" not in ablate:
            dupd = jax.lax.dot_general(
                onehot_w_dt, d_h_full.astype(dt),
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)         # (WN, NHFL)
            if v7:
                dwin[pl.ds(woff, wb), :] += dupd
            else:
                dwin[:] += dupd

        if "accdot" not in ablate:
            dsdst_ref[:] += jax.lax.dot_general(
                d_raw.astype(dt) if v7 else d_raw, onehot_dst,
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)         # (NH8, NB)
            das = jax.lax.dot_general(
                gathered_t.astype(dt), d_raw.astype(dt),
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)   # (PAIR|NHFL, NH8)
            if pair and pair < nhfl:
                das = jnp.pad(das, ((0, nhfl - pair), (0, 0)))
            dasrc_ref[:] += das
        if not sweep1:
            # legacy 2-phase: the cap cotangent is -sum(d_raw); sweep1
            # computes d(cap) in the XLA epilogue (eps' chain) instead
            slot00 = ((jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
                       == 0)
                      & (jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
                         == 0))
            dcap_ref[:] += jnp.where(slot00, -jnp.sum(d_raw), 0.0)

        if not with_dropout:
            # the d_drop output is unused (the caller slices it only
            # when a mask was given) — skip the whole write stream
            return 0
        dmblk = hdotg * ex * invd_e                         # d_drop

        if not dm_on:
            return 0                  # profiling: no d_drop writes
        if v7:
            # eb-aligned tile offsets: no shared overlap block, no RMW
            dmbuf[wslot] = dmblk
        else:
            @pl.when(b == 0)
            def _():
                rm = pltpu.make_async_copy(
                    dmeta_hbm.at[:, pl.ds(start, eb)], rmbuf, rsems.at[1])
                rm.start()
                rm.wait()
                dmbuf[wslot] = dmblk + rmbuf[:]

            @pl.when(b > 0)
            def _():
                dmbuf[wslot] = dmblk

        dma_wm(wslot, b).start()
        return 0

    jax.lax.fori_loop(0, nblocks, body, 0)

    if dm_on and with_dropout:
        # drain in-flight d_drop writes before the tile's trailing window
        # RMW / the next tile's b==0 read of the shared overlap block
        @pl.when(nblocks >= 2)
        def _():
            dma_wm((nblocks - 2) % 2, nblocks - 2).wait()

        @pl.when(nblocks >= 1)
        def _():
            dma_wm((nblocks - 1) % 2, nblocks - 1).wait()

    if not dw_on:
        pass                          # profiling: no d(h) writeback
    elif resident:
        # d(h) lives fully in VMEM across tiles: write once at the end
        @pl.when(i == t - 1)
        def _():
            wr = pltpu.make_async_copy(dwin, dtab_hbm.at[pl.ds(0, w), :],
                                       wsems.at[2])
            wr.start()
            wr.wait()
    elif sliding:
        # sliding-window accumulator (layout certified monotone tile
        # bases, delta <= dmax <= w): rows the next tile's window no
        # longer covers are staged and flushed as a PURE pipelined
        # write. Replaces the serial per-tile read+add+write RMW — no
        # HBM read, and the only wait is for the PREVIOUS tile's flush
        # (needed anyway: consecutive flush slabs overlap, and ordering
        # requires at most one in flight). A row's final flush always
        # carries its complete sum: the last tile whose window covers
        # row r flushes it (r < next_base), and later tiles' slabs start
        # past r.
        def dma_flush(gi):
            b = pl.multiple_of((base_ref[gi] // 8) * 8, 8)
            return pltpu.make_async_copy(
                stage, dtab_hbm.at[pl.ds(b, dmax), :], wsems.at[2])

        @pl.when(i > 0)
        def _():
            dma_flush(i - 1).wait()

        @pl.when(i < t - 1)
        def _():
            stage[:] = dwin[pl.ds(0, dmax), :]
            dma_flush(i).start()
            nxt = pl.multiple_of((base_ref[i + 1] // 8) * 8, 8)
            dlt = pl.multiple_of(nxt - base, 8)
            # shift the accumulator so row 0 tracks the next tile's
            # base; the tail reads from the always-zero slack rows
            dwin[pl.ds(0, w), :] = dwin[pl.ds(dlt, w), :]

        @pl.when(i == t - 1)
        def _():
            wr = pltpu.make_async_copy(
                dwin.at[pl.ds(0, w)], dtab_hbm.at[pl.ds(base, w), :],
                wsems.at[2])
            wr.start()
            wr.wait()
    else:
        # read-add-write this tile's d(h) window. Windows of consecutive
        # tiles overlap, but the TPU grid is sequential and both DMAs
        # below complete before the next tile starts — no hazard.
        rd = pltpu.make_async_copy(dtab_hbm.at[pl.ds(base, w), :], rwin,
                                   rsems.at[0])
        rd.start()
        rd.wait()
        rwin[:] += dwin[:]
        wr = pltpu.make_async_copy(rwin, dtab_hbm.at[pl.ds(base, w), :],
                                   wsems.at[2])
        wr.start()
        wr.wait()


def backward_v6(h8, meta, a_pad, s_dst, cap, base, receivers, e_real,
                g, out, denom, num_nodes: int, nh: int, f: int,
                *, eps: float, slope: float, eb: int, nb: int,
                window: int, with_dropout: bool, interpret: bool,
                block_base=None, tile_ptr=None, wb: int = 0,
                comb=None, dmax: int = -1, sweep1: bool = False,
                gpay=None, normalize: bool = True, pair: int = 0):
    """Returns (d_table (N_rows, NHFL), d_drop (NH8, E_cols),
    d_sdst_t (NH8, N_pad), d_apad (NHFL, NH8), d_cap (8, 128)).
    sweep1: `cap` holds eps' = eps*exp(slope*cap') and `denom` the
    UNNORMALISED den' (v10 single-sweep forward — see _kernel_v6).
    normalize=False computes the PARTS op's VJP (v7_sweep1_parts): pass
    g = d_num and denom = d_den (the raw epilogue cotangents); `out` and
    the cap scalar are unused."""
    dmak = _dmak()
    e = receivers.shape[0]
    t = pl.cdiv(num_nodes, nb)
    n_pad = t * nb
    nh8 = _round_up(nh, 8)
    nhf8 = _round_up(nh * f, 8)
    nhfl = h8.shape[1]
    n_rows = h8.shape[0]
    e_cols = meta.shape[1]
    resident = window == n_rows
    gstream = gpay is not None        # v11 gathered-payload stream
    # sliding d(h) accumulator: valid when the layout certified monotone
    # tile bases (dmax >= 0) and the flush slab stays inside the table
    # (dmax <= window implies no inter-window gaps and in-bounds slabs)
    sliding = (wb > 0 and not resident and 0 <= dmax <= window)

    def node_t(a, rows):
        a_t = a.T
        return jnp.pad(a_t, ((0, rows - a_t.shape[0]),
                             (0, n_pad - a_t.shape[1])))

    g_t = node_t(g, nhf8)
    out_t = node_t(out, nhf8)
    denom_t = node_t(denom, nh8)
    s_dst_t = node_t(s_dst, nh8)

    if tile_ptr is not None:           # v7: eb-aligned offsets from prep
        tile_off = tile_ptr.astype(jnp.int32)
        bbase = block_base.astype(jnp.int32)
    else:
        bounds = jnp.arange(t + 1, dtype=jnp.int32) * nb
        tile_off = jnp.searchsorted(receivers, bounds, side="left"
                                    ).astype(jnp.int32)
        bbase = jnp.zeros((1,), jnp.int32)
    pref = jnp.concatenate([tile_off, e_real[None].astype(jnp.int32)])
    zeros_h = jnp.zeros((n_rows, nhfl), jnp.float32)
    zeros_m = jnp.zeros((nh8, e_cols), jnp.float32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(t,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),   # h8
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),   # meta
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),   # zeros_h
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),   # zeros_m
            pl.BlockSpec((nhf8, nb), lambda i, *_: (0, i),
                         memory_space=pltpu.VMEM),              # g_t
            pl.BlockSpec((nhf8, nb), lambda i, *_: (0, i),
                         memory_space=pltpu.VMEM),              # out_t
            pl.BlockSpec((nh8, nb), lambda i, *_: (0, i),
                         memory_space=pltpu.VMEM),              # denom_t
            pl.BlockSpec((nh8, nb), lambda i, *_: (0, i),
                         memory_space=pltpu.VMEM),              # s_dst_t
            pl.BlockSpec((nhfl, nh8), lambda i, *_: (0, 0),
                         memory_space=pltpu.VMEM),              # a_pad
            pl.BlockSpec((1, 1), lambda i, *_: (0, 0),
                         memory_space=pltpu.SMEM),              # cap
        ] + ([pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM)]  # comb
             if wb else [])
          + ([pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM)]  # gpay
             if gstream else []),
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),   # d_table
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),   # d_drop
            pl.BlockSpec((nh8, nb), lambda i, *_: (0, i),
                         memory_space=pltpu.VMEM),              # d_sdst
            pl.BlockSpec((nhfl, nh8), lambda i, *_: (0, 0),
                         memory_space=pltpu.VMEM),              # d_asrc
            pl.BlockSpec((8, 128), lambda i, *_: (0, 0),
                         memory_space=pltpu.VMEM),              # d_cap
        ),
        scratch_shapes=[
            pltpu.VMEM((1, 8, nhfl) if gstream else
                       (1 if resident else 2, window, nhfl),
                       h8.dtype),           # wbuf (unused under v11)
            pltpu.VMEM((2, meta.shape[0], eb), jnp.float32),    # mbuf
            pltpu.VMEM((window + (dmax if sliding else 0), nhfl),
                       jnp.float32),                            # dwin
            pltpu.VMEM((2, nh8, eb), jnp.float32),              # dmbuf
            pltpu.VMEM((8, 128) if resident or sliding
                       else (window, nhfl),
                       jnp.float32),                # rwin (RMW path only)
            pltpu.VMEM((nh8, eb), jnp.float32),                 # rmbuf
            pltpu.SemaphoreType.DMA((2,)),                      # window in
            pltpu.SemaphoreType.DMA((2,)),                      # meta in
            pltpu.SemaphoreType.DMA((3,)),                      # writes
            pltpu.SemaphoreType.DMA((2,)),                      # readbacks
        ] + ([pltpu.VMEM((2, meta.shape[0] + nh8, dmak * eb),
                         jnp.float32),                          # cbuf
              pltpu.SemaphoreType.DMA((2,))] if wb else [])
          + ([pltpu.VMEM((2, pair or nhfl, dmak * eb),
                         jnp.bfloat16),                        # gbuf
              pltpu.SemaphoreType.DMA((2,))] if gstream else [])
          + ([pltpu.VMEM((dmax, nhfl), jnp.float32)]            # stage
             if sliding else []),
    )
    kernel = functools.partial(
        _kernel_v6_bwd, eb=eb, nb=nb, nh=nh, f=f, nh8=nh8, nhf8=nhf8,
        nhfl=nhfl, w=window, eps=eps, slope=slope,
        with_dropout=with_dropout, resident=resident, wb=wb,
        dmax=dmax if sliding else -1, dmak=dmak, ablate=_ablate(),
        sweep1=sweep1, gstream=gstream, normalize=normalize, pair=pair)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((n_rows, nhfl), jnp.float32),
            jax.ShapeDtypeStruct((nh8, e_cols), jnp.float32),
            jax.ShapeDtypeStruct((nh8, n_pad), jnp.float32),
            jax.ShapeDtypeStruct((nhfl, nh8), jnp.float32),
            jax.ShapeDtypeStruct((8, 128), jnp.float32),
        ),
        input_output_aliases={5: 0, 6: 1},  # zeros -> outputs (after 3
        #                                     scalar-prefetch operands)
        cost_estimate=pl.CostEstimate(
            flops=2 * (e + eb) * (2 * (wb or window) * nh8
                                  + 2 * (wb or window) * nhfl
                                  + 3 * nb * (nhf8 + nh8)),
            bytes_accessed=(2 if resident else 3 * t)
            * window * nhfl * 4
            + 2 * (e + eb) * meta.shape[0] * 4
            + n_pad * (2 * nhf8 + 2 * nh8) * 4,
            transcendentals=(e + eb) * nh8),
        interpret=interpret,
    )(pref, base, bbase, h8, meta, zeros_h, zeros_m, g_t, out_t, denom_t,
      s_dst_t, a_pad, cap.reshape(1, 1),
      *(([comb] if wb else []) + ([gpay] if gstream else [])))


@functools.partial(jax.custom_vjp,
                   nondiff_argnums=(8, 9, 10, 11, 12, 13, 14, 15, 16))
def fused_gat_window(h_flat, a_src, s_dst, drop_mask,
                     senders, receivers, e_real, tile_lo,
                     num_nodes: int, nh: int, f: int,
                     window: int,
                     eps: float = 1e-8, slope: float = 0.01,
                     eb: int = 512, nb: int = 256,
                     interpret: bool = False):
    """Whole-attention fused op for BANDED graphs — the windowed-gather
    twin of fused_gat_table_autocap (same semantics incl. the in-kernel
    global max-cap with exact sparse gradient). Requires
    window >= round8(Graph.src_band) with nb dividing 512; the caller
    (models/gat.py) certifies this statically from canonicalize's
    metadata. No random node<->edge row crossing exists in either pass:
    the forward gathers by one-hot contraction against a sequentially
    streamed VMEM window, the backward scatters d(h) the same way.
    Replaces reference models/gat_layer.py:70-127."""
    out, _ = _fgw_fwd(h_flat, a_src, s_dst, drop_mask, senders,
                      receivers, e_real, tile_lo, num_nodes, nh, f,
                      window, eps, slope, eb, nb, interpret)
    return out


def _fgw_fwd(h_flat, a_src, s_dst, drop_mask, senders, receivers,
             e_real, tile_lo, num_nodes, nh, f, window, eps, slope,
             eb, nb, interpret):
    nh8 = _round_up(nh, 8)
    h8, a_pad, base, nh8, nhfl, n_rows = _v6_prep(
        h_flat, a_src, senders, receivers, tile_lo, num_nodes,
        nh, f, eb, nb, window)
    meta = _pack_meta_v6(drop_mask, receivers, senders, nh8, eb)
    with_dropout = drop_mask is not None
    out, denom, cap, code, _raw, _gp = _forward_v6(
        h8, meta, a_pad, s_dst, base, receivers, e_real, num_nodes,
        nh, f, eps=eps, slope=slope, eb=eb, nb=nb, window=window,
        interpret=interpret, with_dropout=with_dropout)
    return out, (h8, meta, a_pad, s_dst, base, cap, code, senders,
                 receivers, e_real, denom, out, with_dropout,
                 h_flat.shape[0])


def _fgw_bwd(num_nodes, nh, f, window, eps, slope, eb, nb, interpret,
             res, g):
    (h8, meta, a_pad, s_dst, base, cap, code, senders, receivers,
     e_real, denom, out, with_dropout, n_orig) = res
    e = receivers.shape[0]
    nh8 = _round_up(nh, 8)
    d_table, d_drop_t, d_sdst_t, d_apad, d_cap = backward_v6(
        h8, meta, a_pad, s_dst, cap, base, receivers, e_real, g, out,
        denom, num_nodes, nh, f, eps=eps, slope=slope, eb=eb, nb=nb,
        window=window, with_dropout=with_dropout, interpret=interpret)
    d_h_flat = d_table[:n_orig, :nh * f]
    d_a_src = d_apad[:nh * f, :nh]
    d_s_dst = d_sdst_t[:nh].T[:num_nodes]
    d_drop = d_drop_t[:nh, :e].T if with_dropout else None

    # cap chain: route the summed cap cotangent to the argmax triple
    dc = d_cap[0, 0]
    eidx = code // nh8
    hidx = code % nh8
    src_star = jnp.take(senders, eidx)
    dst_star = jnp.take(receivers, eidx)
    hrow = jnp.take(h8, src_star, axis=0)[:nh * f].astype(jnp.float32)
    acol = jnp.take(a_pad, hidx, axis=1)[:nh * f].astype(jnp.float32)
    d_h_flat = d_h_flat.at[src_star].add(dc * acol)
    d_a_src = d_a_src.at[:, hidx].add(dc * hrow)
    d_s_dst = d_s_dst.at[dst_star, hidx].add(dc)
    return (d_h_flat, d_a_src, d_s_dst, d_drop, None, None, None, None)


def _v7_prep(h_flat, a_src, tile_base, nh, f, window):
    """v7 twin of _v6_prep: pad the node table / attention map and clip
    the host-computed per-tile window bases into the padded row range."""
    nhf = nh * f
    nh8 = _round_up(nh, 8)
    nhfl = _round_up(nhf, 128)
    h8 = h_flat if nhf == nhfl else jnp.pad(
        h_flat, ((0, 0), (0, nhfl - nhf)))
    n_rows = h8.shape[0]
    if n_rows < window:
        h8 = jnp.pad(h8, ((0, window - n_rows), (0, 0)))
        n_rows = window
    a_pad = jnp.pad(a_src, ((0, nhfl - a_src.shape[0]),
                            (0, nh8 - a_src.shape[1])))
    base = jnp.minimum(jnp.maximum(tile_base.astype(jnp.int32), 0),
                   n_rows - window)
    return h8, a_pad, base, nh8, nhfl, n_rows


def _v10_sweep1() -> bool:
    """v10 single-sweep forward gate (see _kernel_v6 sweep1 docstring).
    GAT_TPU_V10=0 keeps the 2-phase cap-then-attention forward for
    A/B runs; both produce the same math (1-ulp-class rounding diff
    from the deferred normalisation)."""
    import os
    return os.environ.get("GAT_TPU_V10", "1") != "0"


def _v12_statics(window: int, wb: int, dmax: int, slot: int):
    """Pack-row-unit statics for the v12 packed window (pure function
    of ints — the custom_vjp fwd and bwd must derive identical values
    from the nondiff args)."""
    npack = 128 // slot
    w2 = max(128, _round_up(-(-window // npack), 128))
    wb2 = max(128, _round_up(-(-wb // npack), 128))
    dmax2 = -1 if dmax < 0 else _round_up(dmax // npack + 8, 8)
    return w2, wb2, dmax2, npack


def _v12_prep(h_flat, a_src, tile_base, block_base, nh, f,
              window, wb, dmax):
    """v12 twin of _v7_prep: pack the node table 128//slot nodes per
    128-lane row (a free reshape when nh*f == slot) and convert the
    layout's bases to pack-row units. Layout arrays stay in NODE units
    on the Graph; the conversion happens here so the same BlockLayout
    serves both modes."""
    slot = _pair_slot(nh * f)
    nhf = nh * f
    nh8 = _round_up(nh, 8)
    w2, wb2, dmax2, npack = _v12_statics(window, wb, dmax, slot)
    h64 = h_flat if nhf == slot else jnp.pad(
        h_flat, ((0, 0), (0, slot - nhf)))
    n = h64.shape[0]
    n_up = _round_up(n, npack)
    if n_up != n:
        h64 = jnp.pad(h64, ((0, n_up - n), (0, 0)))
    h2 = h64.reshape(n_up // npack, 128)
    n_rows = h2.shape[0]
    if n_rows < w2:
        h2 = jnp.pad(h2, ((0, w2 - n_rows), (0, 0)))
        n_rows = w2
    a_pad = jnp.pad(a_src, ((0, 128 - a_src.shape[0]),
                            (0, nh8 - a_src.shape[1])))
    base2 = jnp.minimum(jnp.maximum(
        tile_base.astype(jnp.int32) // npack, 0), n_rows - w2)
    bbase2 = block_base.astype(jnp.int32) // npack
    return h2, a_pad, base2, bbase2, w2, wb2, dmax2, slot


@functools.partial(jax.custom_vjp,
                   nondiff_argnums=(10, 11, 12, 13, 14, 15, 16, 17,
                                    18, 19, 20))
def fused_gat_window_v7(h_flat, a_src, s_dst, drop_mask,
                        senders, receivers, block_base, tile_ptr,
                        tile_base, score_bound,
                        num_nodes: int, nh: int, f: int,
                        window: int, wb: int,
                        eps: float = 1e-8, slope: float = 0.01,
                        eb: int = 512, nb: int = 256,
                        interpret: bool = False, dmax: int = -1):
    """Block-local-window variant of fused_gat_window (same semantics,
    same in-kernel global max-cap). Consumes the v7 layout emitted by
    graph/transforms.compute_block_layout (Graph.block_layout): edges
    tile-grouped, src-sorted and eb-padded per tile (senders/receivers
    here are the LAYOUT's arrays; pad slots have recv == -1 and
    self-mask through the destination one-hot), per-block 128-aligned
    window bases, per-tile eb-aligned offsets. Every one-hot
    construction and gather/scatter contraction runs against a wb-row
    slice of the streamed tile window — VPU + MXU work per edge drop by
    window/wb vs fused_gat_window. drop_mask, when given, is
    (E7, nh) in LAYOUT order (attention-dropout masks are iid per edge,
    so generating them directly in layout order is equivalent).
    score_bound: any global scalar >= max raw logit (keeps the
    single-sweep exp <= 1 — overflow-safe); None computes it from the
    node score tables. Ignored by the 2-phase mode (GAT_TPU_V10=0).
    Replaces reference models/gat_layer.py:70-127."""
    out, _ = _fgw7_fwd(h_flat, a_src, s_dst, drop_mask, senders,
                       receivers, block_base, tile_ptr, tile_base,
                       score_bound,
                       num_nodes, nh, f, window, wb, eps, slope, eb, nb,
                       interpret, dmax)
    return out


def _fgw7_fwd(h_flat, a_src, s_dst, drop_mask, senders, receivers,
              block_base, tile_ptr, tile_base, score_bound,
              num_nodes, nh, f, window,
              wb, eps, slope, eb, nb, interpret, dmax=-1):
    sweep1 = _v10_sweep1()
    if sweep1:
        if score_bound is None:
            s_src_n = jnp.dot(h_flat, a_src,
                              preferred_element_type=jnp.float32)
            score_bound = jnp.max(s_src_n) + jnp.max(s_dst)
        # B cancels algebraically (the epilogue divides it back out), so
        # its cotangent is exactly zero — stop_gradient is semantics,
        # not an approximation
        b = jax.lax.stop_gradient(score_bound)
        s_dst_eff = s_dst - b
    else:
        s_dst_eff = s_dst
    nh8 = _round_up(nh, 8)
    # v12 packed window (pair > 0): nh*f <= 64, node table packed
    # 128//pair nodes per row, layout bases converted to pack units
    pair = _pair_slot(nh * f) if sweep1 else 0
    if pair:
        h8, a_pad, base, bbase, w_eff, wb_eff, dmax_eff, pair = \
            _v12_prep(h_flat, a_src, tile_base, block_base, nh, f,
                      window, wb, dmax)
    else:
        h8, a_pad, base, nh8, nhfl, n_rows = _v7_prep(
            h_flat, a_src, tile_base, nh, f, window)
        bbase, w_eff, wb_eff, dmax_eff = block_base, window, wb, dmax
    # pad to the grouped-DMA overhang (a tile's last dmak-block group
    # read/write may extend up to dmak*eb columns past its edge range)
    meta = _pack_meta_v6(drop_mask, receivers, senders, nh8,
                         _dmak() * eb)
    with_dropout = drop_mask is not None
    e7 = jnp.int32(senders.shape[0])
    # v11 gathered-payload stream: only meaningful in the bf16
    # contraction mode (where it is bit-identical to the backward's
    # own gather — exact bf16 selection; under v12 the stream carries
    # the slot-SELECTED rows, still an exact selection); the f32 parity
    # mode keeps the recompute. GAT_TPU_V11=0 disables.
    import os as _os
    gstream = (sweep1 and _v6_dtype() == jnp.bfloat16
               and _os.environ.get("GAT_TPU_V11", "1") != "0")
    out, denom, cap, code, comb, gpay = _forward_v6(
        h8, meta, a_pad, s_dst_eff, base, receivers, e7, num_nodes,
        nh, f, eps=eps, slope=slope, eb=eb, nb=nb, window=w_eff,
        interpret=interpret, with_dropout=with_dropout,
        block_base=bbase, tile_ptr=tile_ptr, wb=wb_eff, sweep1=sweep1,
        gstream=gstream, pair=pair)
    epsp = None
    if sweep1:
        # out/denom are UNNORMALISED [num | den]; cap is cap' = max of
        # the B-shifted raw. Normalise here: the +eps of the reference
        # softmax scales to eps' = eps*exp(slope*cap') in B-shifted
        # space (exact algebra — docstring of _kernel_v6).
        epsp = eps * jnp.exp(slope * cap)
        inv = jnp.where(denom > 0.0, 1.0 / (denom + epsp), 0.0)
        out = (out.reshape(num_nodes, nh, f)
               * inv[:, :, None]).reshape(num_nodes, nh * f)
    return out, (h8, meta, a_pad, s_dst_eff, base, cap, code, senders,
                 receivers, denom, out, with_dropout, h_flat.shape[0],
                 bbase, tile_ptr, comb, sweep1, epsp, gpay)


def _fgw7_bwd(num_nodes, nh, f, window, wb, eps, slope, eb, nb,
              interpret, dmax, res, g):
    (h8, meta, a_pad, s_dst, base, cap, code, senders, receivers,
     denom, out, with_dropout, n_orig, block_base, tile_ptr, comb,
     sweep1, epsp, gpay) = res
    e = receivers.shape[0]
    nh8 = _round_up(nh, 8)
    pair = _pair_slot(nh * f) if sweep1 else 0
    if pair:
        w_eff, wb_eff, dmax_eff, _np_ = _v12_statics(window, wb, dmax,
                                                     pair)
    else:
        w_eff, wb_eff, dmax_eff = window, wb, dmax
    # sweep1: the kernel's SMEM scalar slot carries eps' (effective
    # epilogue eps) instead of the cap, and denom is the unnormalised
    # den' — see backward_v6 docstring
    scalar = epsp if sweep1 else cap
    d_table, d_drop_t, d_sdst_t, d_apad, d_cap = backward_v6(
        h8, meta, a_pad, s_dst, scalar, base, receivers, jnp.int32(e),
        g, out, denom, num_nodes, nh, f, eps=eps, slope=slope, eb=eb,
        nb=nb, window=w_eff, with_dropout=with_dropout,
        interpret=interpret, block_base=block_base, tile_ptr=tile_ptr,
        wb=wb_eff, comb=comb, dmax=dmax_eff, sweep1=sweep1, gpay=gpay,
        pair=pair)
    if pair:
        # unpack the pack-row d(h) table back to node rows
        d_table = d_table.reshape(-1, pair)
    d_h_flat = d_table[:n_orig, :nh * f]
    d_a_src = d_apad[:nh * f, :nh]
    d_s_dst = d_sdst_t[:nh].T[:num_nodes]
    d_drop = d_drop_t[:nh, :e].T if with_dropout else None

    # cap chain: route the cap cotangent to the argmax (edge, head).
    # sweep1: the cap enters only through eps' = eps*exp(slope*cap') in
    # the XLA epilogue out = num/(den+eps'), so
    # d(cap') = sum_nh [ (sum_f g*out) * (-inv) ] * slope*eps'.
    if sweep1:
        inv = jnp.where(denom > 0.0, 1.0 / (denom + epsp), 0.0)
        gout_h = jnp.sum((g * out).reshape(num_nodes, nh, f), axis=2)
        dc = -slope * epsp * jnp.sum(gout_h * inv)
    else:
        dc = d_cap[0, 0]
    eidx = code // nh8
    hidx = code % nh8
    src_star = jnp.take(senders, eidx)
    dst_star = jnp.take(receivers, eidx)
    if pair:
        npk = 128 // pair
        prow = jnp.take(h8, src_star // npk, axis=0)
        hrow = jax.lax.dynamic_slice(
            prow, ((src_star % npk) * pair,), (pair,))[:nh * f
                                                       ].astype(jnp.float32)
    else:
        hrow = jnp.take(h8, src_star, axis=0)[:nh * f
                                              ].astype(jnp.float32)
    acol = jnp.take(a_pad, hidx, axis=1)[:nh * f].astype(jnp.float32)
    d_h_flat = d_h_flat.at[src_star].add(dc * acol)
    d_a_src = d_a_src.at[:, hidx].add(dc * hrow)
    d_s_dst = d_s_dst.at[dst_star, hidx].add(dc)
    return (d_h_flat, d_a_src, d_s_dst, d_drop, None, None, None, None,
            None, None)


fused_gat_window_v7.defvjp(_fgw7_fwd, _fgw7_bwd)


fused_gat_window.defvjp(_fgw_fwd, _fgw_bwd)


@functools.partial(jax.custom_vjp,
                   nondiff_argnums=(9, 10, 11, 12, 13, 14, 15, 16, 17,
                                    18, 19))
def v7_sweep1_parts(h_flat, a_src, s_dst, drop_mask,
                    senders, receivers, block_base, tile_ptr, tile_base,
                    num_nodes: int, nh: int, f: int,
                    window: int, wb: int,
                    eps: float = 1e-8, slope: float = 0.01,
                    eb: int = 512, nb: int = 256,
                    interpret: bool = False, dmax: int = -1):
    """UNNORMALISED windowed single-sweep attention parts over (possibly
    shard-local) dst rows — the v7/v10/v11 twin of
    segment_attention.v5_sweep1_parts, so the FLAGSHIP kernel family
    reaches the dst-owner distributed layout (VERDICT r3 item 1).

    Consumes a per-shard v7 block layout (receivers shard-LOCAL over
    num_nodes dst rows; senders GLOBAL into the replicated h_flat table —
    graph/transforms.compute_block_layout(n_src=N)). Returns
    (num (N_local, NH*F), den (N_local, NH), cap' scalar — the max of the
    B-shifted raw logits this shard saw — and the argmax code). The
    caller completes the softmax after collectives over the edge axis:

        cap_g' = pmax(cap'); eps' = eps * exp(slope * cap_g')
        out = num / (den + eps')      (0 where den == 0)

    s_dst must arrive ALREADY B-shifted (subtract a pmax'd global score
    bound). INTERNAL CONTRACT: the VJP assumes num/den feed only such an
    epilogue (cotangents consumed raw via backward_v6 normalize=False);
    cap's cotangent is routed to the argmax (edge, head) exactly like
    fused_gat_window_v7's cap chain."""
    outs, _ = _v7sp_fwd(h_flat, a_src, s_dst, drop_mask, senders,
                        receivers, block_base, tile_ptr, tile_base,
                        num_nodes, nh, f, window, wb, eps, slope, eb, nb,
                        interpret, dmax)
    return outs


def _v7sp_fwd(h_flat, a_src, s_dst, drop_mask, senders, receivers,
              block_base, tile_ptr, tile_base,
              num_nodes, nh, f, window, wb, eps, slope, eb, nb,
              interpret, dmax):
    nh8 = _round_up(nh, 8)
    pair = _pair_slot(nh * f)
    if pair:
        h8, a_pad, base, bbase, w_eff, wb_eff, dmax_eff, pair = \
            _v12_prep(h_flat, a_src, tile_base, block_base, nh, f,
                      window, wb, dmax)
    else:
        h8, a_pad, base, nh8, nhfl, n_rows = _v7_prep(
            h_flat, a_src, tile_base, nh, f, window)
        bbase, w_eff, wb_eff = block_base, window, wb
    meta = _pack_meta_v6(drop_mask, receivers, senders, nh8,
                         _dmak() * eb)
    with_dropout = drop_mask is not None
    e7 = jnp.int32(senders.shape[0])
    import os as _os
    gstream = (_v6_dtype() == jnp.bfloat16
               and _os.environ.get("GAT_TPU_V11", "1") != "0")
    num, den, cap, code, comb, gpay = _forward_v6(
        h8, meta, a_pad, s_dst, base, receivers, e7, num_nodes,
        nh, f, eps=eps, slope=slope, eb=eb, nb=nb, window=w_eff,
        interpret=interpret, with_dropout=with_dropout,
        block_base=bbase, tile_ptr=tile_ptr, wb=wb_eff, sweep1=True,
        gstream=gstream, pair=pair)
    return ((num, den, cap, code),
            (h8, meta, a_pad, s_dst, base, code, senders, receivers,
             with_dropout, h_flat.shape[0], bbase, tile_ptr, comb,
             gpay))


def _v7sp_bwd(num_nodes, nh, f, window, wb, eps, slope, eb, nb,
              interpret, dmax, res, ct):
    (h8, meta, a_pad, s_dst, base, code, senders, receivers,
     with_dropout, n_orig, block_base, tile_ptr, comb, gpay) = res
    d_num, d_den, d_cap_in, _d_code = ct
    e = receivers.shape[0]
    nh8 = _round_up(nh, 8)
    pair = _pair_slot(nh * f)
    if pair:
        w_eff, wb_eff, dmax_eff, _np_ = _v12_statics(window, wb, dmax,
                                                     pair)
    else:
        w_eff, wb_eff, dmax_eff = window, wb, dmax
    d_table, d_drop_t, d_sdst_t, d_apad, _unused = backward_v6(
        h8, meta, a_pad, s_dst, jnp.float32(0.0), base, receivers,
        jnp.int32(e), d_num, jnp.zeros_like(d_num), d_den, num_nodes,
        nh, f, eps=eps, slope=slope, eb=eb, nb=nb, window=w_eff,
        with_dropout=with_dropout, interpret=interpret,
        block_base=block_base, tile_ptr=tile_ptr, wb=wb_eff, comb=comb,
        dmax=dmax_eff, sweep1=True, gpay=gpay, normalize=False,
        pair=pair)
    if pair:
        d_table = d_table.reshape(-1, pair)
    d_h_flat = d_table[:n_orig, :nh * f]
    d_a_src = d_apad[:nh * f, :nh]
    d_s_dst = d_sdst_t[:nh].T[:num_nodes]
    d_drop = d_drop_t[:nh, :e].T if with_dropout else None

    # cap chain: the caller differentiates its epilogue, so d_cap_in is
    # the already-assembled cap cotangent — route it to the argmax
    dc = d_cap_in
    eidx = code // nh8
    hidx = code % nh8
    src_star = jnp.take(senders, eidx)
    dst_star = jnp.take(receivers, eidx)
    if pair:
        npk = 128 // pair
        prow = jnp.take(h8, src_star // npk, axis=0)
        hrow = jax.lax.dynamic_slice(
            prow, ((src_star % npk) * pair,), (pair,))[:nh * f
                                                       ].astype(jnp.float32)
    else:
        hrow = jnp.take(h8, src_star, axis=0)[:nh * f
                                              ].astype(jnp.float32)
    acol = jnp.take(a_pad, hidx, axis=1)[:nh * f].astype(jnp.float32)
    d_h_flat = d_h_flat.at[src_star].add(dc * acol)
    d_a_src = d_a_src.at[:, hidx].add(dc * hrow)
    d_s_dst = d_s_dst.at[dst_star, hidx].add(dc)
    return (d_h_flat, d_a_src, d_s_dst, d_drop, None, None, None, None,
            None)


v7_sweep1_parts.defvjp(_v7sp_fwd, _v7sp_bwd)
