"""Fused segment-softmax + SpMM Pallas kernel — the GAT hot path on TPU.

Replaces the reference's scatter_add/index_select pipeline
(reference: models/gat_layer.py:96-127, models/utils.py:6-27) with ONE
kernel pass over the dst-sorted edge list:

    exp(logit) -> per-destination denominator -> alpha-weighted aggregation

Key ideas (TPU-first, no atomics, no scatter):
  * Edges are sorted by destination, so the edges of a contiguous tile of
    NB destination nodes form one contiguous range [lo, hi) of the edge
    array — per-tile ranges arrive via scalar prefetch and the kernel DMAs
    EB-edge blocks HBM->VMEM through a double buffer.
  * Reduction-by-destination is a compare-and-matmul: a (EB, NB) one-hot
    of (receiver == tile node) contracted on the MXU against the per-edge
    values. No scatter anywhere; deterministic by construction.
  * Normalisation is factored out of the edge loop:
        out[n] = sum_e exp_e * h_e / (denom[n] + eps)
    so softmax and aggregation fuse into a single pass and the (E, NH)
    exp/alpha intermediates never touch HBM. Attention dropout composes
    with the factoring (the mask multiplies the numerator only), so the
    caller passes a pre-scaled keep-mask and training still fuses.
  * Out-of-range edge reads (block overrun past `hi`, padding edges) are
    harmless: their logits are -inf (exp = 0) or their receiver falls
    outside the tile (one-hot row of zeros).

The backward pass is a custom VJP in plain XLA (quotient rule on the
saved denominators — cheaper than recompute, exact). Forward parity with
ops/segment.py is tested in interpret mode on CPU.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _matmul_dtype():
    """Kernel contraction input dtype. f32 inputs run the MXU's multi-
    pass float path; bf16 inputs (accumulation stays f32 via
    preferred_element_type) double MXU throughput at the cost of
    rounding h/exp to 8-bit mantissas. Opt in with
    GAT_TPU_KERNEL_DTYPE=bfloat16 (read once at import)."""
    import os
    return (jnp.bfloat16
            if os.environ.get("GAT_TPU_KERNEL_DTYPE") == "bfloat16"
            else jnp.float32)


MATMUL_DTYPE = None  # resolved lazily on first kernel trace


def _round_up(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


def _kernel(tile_off_ref,          # scalar prefetch: (T+1,) int32
            packed_hbm,            # (R, E_pad) f32, edge-major lanes
            acc_ref,               # VMEM output (NHF8+NH8, NB) per tile:
            #                        rows [0, NHF8) numerator, rows
            #                        [NHF8, NHF8+NH8) denominator
            buf, sems,
            *, eb: int, nb: int, nh: int, f: int, nh8: int, nhf8: int,
            e_real: int, eps: float, with_dropout: bool,
            normalize: bool = True):
    """The edge data arrives PACKED and TRANSPOSED: one f32 array whose
    lane (minor) axis is the edge axis and whose rows stack
        [0, NHF8)                        gathered source features h
        [NHF8, NHF8+NH8)                 logits (pad rows/edges -inf)
        [NHF8+NH8, NHF8+2*NH8)           dropout keep-mask (optional)
        last 8 rows (row 0 meaningful)   receiver ids as f32 (exact for
                                         ids < 2^24)
    One array means ONE dma per edge block — descriptor issue overhead,
    not bandwidth, dominates this kernel at small tile counts, so
    minimising DMA count is the first-order optimisation. Every slice is
    [all-rows, EB lanes] with EB a multiple of 128 and row counts padded
    to multiples of 8 (f32 tile granularity — sub-tile slices are
    unsupported). Output transposed too: (NHF8+NH8, N).
    """
    i = pl.program_id(0)
    # align the tile's first block down to an EB boundary: DMA starts must
    # be provably 128-divisible, and the leading out-of-tile edges are
    # harmless (their receivers miss the one-hot below)
    lo = (tile_off_ref[i] // eb) * eb
    hi = tile_off_ref[i + 1]
    nblocks = pl.cdiv(hi - lo, eb)

    # head-expander (NH8, NHF8): row h is 1 on columns [h*F, (h+1)*F).
    # Broadcasting per-head scalars over their F feature rows via this
    # small MXU matmul avoids lane-splitting reshapes (unsupported).
    exp_rows = jax.lax.broadcasted_iota(jnp.int32, (nh8, nhf8), 0)
    exp_cols = jax.lax.broadcasted_iota(jnp.int32, (nh8, nhf8), 1)
    expander = ((exp_cols // f == exp_rows)
                & (exp_rows < nh) & (exp_cols < nh * f)).astype(jnp.float32)

    acc_ref[:] = jnp.zeros_like(acc_ref)

    nbuf = 2  # double buffer

    def dma(slot, b):
        start = pl.multiple_of(lo + b * eb, eb)
        return pltpu.make_async_copy(packed_hbm.at[:, pl.ds(start, eb)],
                                     buf.at[slot], sems.at[slot])

    @pl.when(nblocks > 0)
    def _():
        dma(0, 0).start()

    def body(b, _):
        slot = b % nbuf

        @pl.when(b + 1 < nblocks)
        def _():
            dma((b + 1) % nbuf, b + 1).start()

        dma(slot, b).wait()

        start = pl.multiple_of(lo + b * eb, eb)
        block = buf[slot]                                   # (R, EB)
        h_t = block[0:nhf8, :]
        ex_t = jnp.exp(block[nhf8:nhf8 + nh8, :])           # (NH8, EB)
        # columns past the real edge count are zero-filled pad (exp(0)=1):
        # mask them here so the pack needs no special fill values
        col = start + jax.lax.broadcasted_iota(jnp.int32, (1, eb), 1)
        ex_t = jnp.where(col < e_real, ex_t, 0.0)
        recv_at = nhf8 + nh8 + (nh8 if with_dropout else 0)
        recv_row = block[recv_at:recv_at + 1, :]
        # one-hot^T of receiver vs this tile's node range; edges whose
        # receiver is outside the tile (block overrun) vanish here
        rows = (i * nb
                + jax.lax.broadcasted_iota(jnp.int32, (nb, eb), 0)
                ).astype(jnp.float32)
        onehot_t = (recv_row == rows).astype(jnp.float32)   # (NB, EB)

        num_t = ex_t
        if with_dropout:
            num_t = num_t * block[nhf8 + nh8:nhf8 + 2 * nh8, :]
        num_wide = jax.lax.dot_general(
            expander, num_t, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)             # (NHF8, EB)
        weighted_t = h_t * num_wide
        # ONE fused contraction for numerator AND denominator: the ex
        # rows ride along under the weighted features, so the EB-deep
        # matmul (the kernel's dominant MXU cost) runs once per block
        dt = _matmul_dtype()
        combined = jnp.concatenate([weighted_t, ex_t], axis=0).astype(dt)
        acc_ref[:] += jax.lax.dot_general(
            combined, onehot_t.astype(dt), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)     # (NHF8+NH8, NB)
        return 0

    jax.lax.fori_loop(0, nblocks, body, 0)

    if normalize:
        # empty segments (padding, eps=0 faithful mode) -> 0, not 0*inf
        d = acc_ref[nhf8:, :]                               # (NH8, NB)
        inv = jnp.where(d > 0.0, 1.0 / (d + eps), 0.0)
        inv_wide = jax.lax.dot_general(
            expander, inv, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)             # (NHF8, NB)
        acc_ref[:nhf8, :] = acc_ref[:nhf8, :] * inv_wide


def _forward(logits: jax.Array,       # (E, NH) post-LeakyReLU/cap; pad=-inf
             h_src: jax.Array,        # (E, NH*F) gathered source features
             receivers: jax.Array,    # (E,) int32, dst-sorted
             drop_mask: Optional[jax.Array],  # (E, NH) prescaled keep mask
             num_nodes: int, nh: int, f: int,
             *, eps: float, eb: int, nb: int, interpret: bool,
             normalize: bool = True,
             vma: tuple = (),
             return_packed: bool = False):
    """vma: mesh axis names this call varies over — required by
    shard_map's varying-axes checker when the kernel runs per edge shard
    (jax.ShapeDtypeStruct(vma=...) on the pallas_call outputs). The
    compiled path traces the kernel body with vma checking disabled
    (jax pallas_call internals), so only the boundary needs annotating;
    interpret mode inlines the kernel and trips the checker — run
    interpret-mode shard_map tests with check_vma=False, forward only."""
    e = logits.shape[0]
    t = pl.cdiv(num_nodes, nb)
    n_pad = t * nb
    nh8 = _round_up(nh, 8)
    nhf8 = _round_up(nh * f, 8)

    with_dropout = drop_mask is not None
    rows_total = nhf8 + nh8 + (nh8 if with_dropout else 0) + 8

    # pack everything edge-major into ONE f32 array (single DMA per edge
    # block — see _kernel docstring). Data movement is minimised: one
    # concatenate of the transposed sections + ONE zero pad for row/
    # overrun alignment (per-part pads and fill values would each
    # materialise a full pass — docs/PERF.md probes). Zero fills are safe
    # because the kernel masks columns >= e_real itself and phantom head
    # rows are zeroed by the expander.
    def align8(a_t):
        r8 = _round_up(a_t.shape[0], 8)
        if r8 == a_t.shape[0]:
            return a_t
        return jnp.pad(a_t, ((0, r8 - a_t.shape[0]), (0, 0)))

    parts = [align8(h_src.T), align8(logits.T)]
    if with_dropout:
        parts.append(align8(drop_mask.T))
    parts.append(receivers.astype(jnp.float32)[None, :])
    packed = jnp.concatenate(parts, axis=0)
    packed = jnp.pad(packed, ((0, rows_total - packed.shape[0]), (0, eb)))

    # per-tile contiguous edge ranges (receivers ascending)
    bounds = jnp.arange(t + 1, dtype=jnp.int32) * nb
    if vma:
        bounds = jax.lax.pcast(bounds, tuple(vma), to="varying")
    tile_off = jnp.searchsorted(receivers, bounds, side="left"
                                ).astype(jnp.int32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(t,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),  # packed
        ],
        out_specs=pl.BlockSpec((nhf8 + nh8, nb), lambda i, *_: (0, i),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, rows_total, eb), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )

    kernel = functools.partial(_kernel, eb=eb, nb=nb, nh=nh, f=f,
                               nh8=nh8, nhf8=nhf8, e_real=e, eps=eps,
                               with_dropout=with_dropout,
                               normalize=normalize)
    flops_est = 2 * 2 * (e + eb) * nb * (nhf8 + nh8)
    sds_kw = {"vma": frozenset(vma)} if vma else {}
    acc_t = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nhf8 + nh8, n_pad), jnp.float32,
                                       **sds_kw),
        cost_estimate=pl.CostEstimate(
            flops=flops_est,
            bytes_accessed=(e + eb) * rows_total * 4
            + n_pad * (nhf8 + nh8) * 4,
            transcendentals=(e + eb) * nh8),
        interpret=interpret,
    )(tile_off, packed)
    out = (acc_t[:nh * f].T[:num_nodes],
           acc_t[nhf8:nhf8 + nh].T[:num_nodes])
    return out + (packed,) if return_packed else out


# --------------------------------------------------------------------------
# v4 split-input path: h_src arrives as its own edge-major HBM array and the
# small metadata (logits | dropout | receivers) as a second one — 2 DMAs per
# block instead of 1 (measured free, docs/PERF.md v2-vs-v3), killing the
# single giant XLA transpose+concat+pad that dominated the composite at
# scale (prep 8.28 ms vs 0.6 ms kernel at 1M edges).
# --------------------------------------------------------------------------

def _kernel_split(tile_off_ref,        # scalar prefetch: (T+1,) int32
                  h_hbm,               # features: (NHF8, E_cols) edge-major
                  #                      or (E_cols, NHF8) row-major when
                  #                      h_rowmajor (transposed in-kernel)
                  meta_hbm,            # (MR, E_cols): logits | drop | recv
                  acc_ref,             # VMEM out (NHF8+NH8, NB) per tile
                  hbuf, mbuf, sems,
                  *, eb: int, nb: int, nh: int, f: int, nh8: int,
                  nhf8: int, e_real: int, eps: float, with_dropout: bool,
                  normalize: bool = True, h_rowmajor: bool = False):
    i = pl.program_id(0)
    lo = (tile_off_ref[i] // eb) * eb
    hi = tile_off_ref[i + 1]
    nblocks = pl.cdiv(hi - lo, eb)

    exp_rows = jax.lax.broadcasted_iota(jnp.int32, (nh8, nhf8), 0)
    exp_cols = jax.lax.broadcasted_iota(jnp.int32, (nh8, nhf8), 1)
    expander = ((exp_cols // f == exp_rows)
                & (exp_rows < nh) & (exp_cols < nh * f)).astype(jnp.float32)

    acc_ref[:] = jnp.zeros_like(acc_ref)
    nbuf = 2

    def dma_h(slot, b):
        start = pl.multiple_of(lo + b * eb, eb)
        if h_rowmajor:
            return pltpu.make_async_copy(h_hbm.at[pl.ds(start, eb), :],
                                         hbuf.at[slot], sems.at[slot, 0])
        return pltpu.make_async_copy(h_hbm.at[:, pl.ds(start, eb)],
                                     hbuf.at[slot], sems.at[slot, 0])

    def dma_m(slot, b):
        start = pl.multiple_of(lo + b * eb, eb)
        return pltpu.make_async_copy(meta_hbm.at[:, pl.ds(start, eb)],
                                     mbuf.at[slot], sems.at[slot, 1])

    @pl.when(nblocks > 0)
    def _():
        dma_h(0, 0).start()
        dma_m(0, 0).start()

    def body(b, _):
        slot = b % nbuf

        @pl.when(b + 1 < nblocks)
        def _():
            dma_h((b + 1) % nbuf, b + 1).start()
            dma_m((b + 1) % nbuf, b + 1).start()

        dma_h(slot, b).wait()
        dma_m(slot, b).wait()

        start = pl.multiple_of(lo + b * eb, eb)
        if h_rowmajor:
            # XLA's row gather delivers (EB, NHFL>=128 lanes); transpose
            # on-chip and slice to the real rows — a lane-axis gather
            # from a transposed table lowers to 1-lane column slices
            # (measured ~100x slower, PERF.md r2)
            h_t = hbuf[slot].T[:nhf8].astype(jnp.float32)   # (NHF8, EB)
        else:
            h_t = hbuf[slot].astype(jnp.float32)            # (NHF8, EB)
        meta = mbuf[slot]                                   # (MR, EB)
        ex_t = jnp.exp(meta[0:nh8, :])                      # (NH8, EB)
        col = start + jax.lax.broadcasted_iota(jnp.int32, (1, eb), 1)
        ex_t = jnp.where(col < e_real, ex_t, 0.0)
        recv_at = nh8 + (nh8 if with_dropout else 0)
        recv_row = meta[recv_at:recv_at + 1, :]
        rows = (i * nb
                + jax.lax.broadcasted_iota(jnp.int32, (nb, eb), 0)
                ).astype(jnp.float32)
        onehot_t = (recv_row == rows).astype(jnp.float32)   # (NB, EB)

        num_t = ex_t
        if with_dropout:
            num_t = num_t * meta[nh8:2 * nh8, :]
        num_wide = jax.lax.dot_general(
            expander, num_t, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)             # (NHF8, EB)
        weighted_t = h_t * num_wide
        dt = _matmul_dtype()
        combined = jnp.concatenate([weighted_t, ex_t], axis=0).astype(dt)
        acc_ref[:] += jax.lax.dot_general(
            combined, onehot_t.astype(dt), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)     # (NHF8+NH8, NB)
        return 0

    jax.lax.fori_loop(0, nblocks, body, 0)

    if normalize:
        d = acc_ref[nhf8:, :]
        inv = jnp.where(d > 0.0, 1.0 / (d + eps), 0.0)
        inv_wide = jax.lax.dot_general(
            expander, inv, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        acc_ref[:nhf8, :] = acc_ref[:nhf8, :] * inv_wide


def pack_meta(logits: jax.Array,              # (E, NH) row-major
              drop_mask: Optional[jax.Array],  # (E, NH) or None
              receivers: jax.Array,            # (E,)
              nh8: int, eb: int) -> jax.Array:
    """(MR, E+eb) edge-major metadata: logits rows (NH8-padded), optional
    dropout rows, receiver row (8-padded tail). Small arrays only — the
    feature payload travels separately (h_src_t)."""
    def align8(a_t):
        r8 = _round_up(a_t.shape[0], 8)
        if r8 == a_t.shape[0]:
            return a_t
        return jnp.pad(a_t, ((0, r8 - a_t.shape[0]), (0, 0)))

    parts = [align8(logits.T)]
    if drop_mask is not None:
        parts.append(align8(drop_mask.T))
    parts.append(receivers.astype(jnp.float32)[None, :])
    meta = jnp.concatenate(parts, axis=0)
    mr = nh8 * (2 if drop_mask is not None else 1) + 8
    return jnp.pad(meta, ((0, mr - meta.shape[0]), (0, eb)))


def gather_h_src_t(h_flat: jax.Array,         # (N, NH*F) node-major
                   senders: jax.Array,        # (E,) int32
                   nhf8: int, eb: int):
    """Gathered source features for the kernel, via ONE XLA gather with
    no separate pack/concat pass. Returns (array, rowmajor: bool).
    GAT_TPU_GATHER picks the formulation:
      rowk (default): row-gather only -> (E+eb, NHF8) ROW-major; the
                      kernel transposes each block on-chip (XLA row
                      gather is its fast case — full-row slices);
      row:            row-gather + XLA transpose -> edge-major (the
                      round-1 layout, kept for A/B timing);
      lane:           gather columns of the transposed table -> edge-
                      major directly. Measured ~100x SLOWER on TPU (XLA
                      lowers it to 1-lane column slices); kept only as
                      the documented dead end.
    Suffix "_pib" uses mode="wrap" (PROMISE_IN_BOUNDS underneath) —
    canonicalised senders are always in-bounds, the default FILL_OR_DROP
    adds out-of-bounds predication. GAT_TPU_GATHER_BARRIER=1 puts an
    optimization barrier between table prep and the take.
    GAT_TPU_H_DTYPE=bfloat16 casts the table BEFORE the gather — halves
    the dominant per-edge feature traffic; accumulation stays f32 in the
    kernel (preferred_element_type)."""
    import os
    if (os.environ.get("GAT_TPU_H_DTYPE") == "bfloat16"
            and h_flat.dtype == jnp.float32):
        h_flat = h_flat.astype(jnp.bfloat16)
    nhf = h_flat.shape[1]
    s = jnp.pad(senders, (0, eb))
    mode = os.environ.get("GAT_TPU_GATHER", "rowk")
    kw = {"mode": "wrap"} if mode.endswith("_pib") else {}
    barrier = os.environ.get("GAT_TPU_GATHER_BARRIER") == "1"
    if mode.startswith("rowk"):
        # row-major blocks are DMA-sliced on sublanes, but Mosaic still
        # requires the LANE dim be a multiple of 128 — pad the table to
        # 128 lanes (N-sized pad; the kernel slices back to nhf8 rows
        # after its on-chip transpose)
        nhfl = _round_up(nhf, 128)
        h8 = h_flat if nhf == nhfl else jnp.pad(
            h_flat, ((0, 0), (0, nhfl - nhf)))               # N-sized pad
        if barrier:
            h8 = jax.lax.optimization_barrier(h8)
        return jnp.take(h8, s, axis=0, **kw), True           # (E+eb, NHFL)
    if mode.startswith("row"):
        g = jnp.take(h_flat, s, axis=0, **kw)                # (E+eb, NHF)
        if barrier:
            g = jax.lax.optimization_barrier(g)
        return jnp.pad(g, ((0, 0), (0, nhf8 - nhf))).T, False
    h_t8 = jnp.pad(h_flat.T, ((0, nhf8 - nhf), (0, 0)))      # (NHF8, N)
    if barrier:
        h_t8 = jax.lax.optimization_barrier(h_t8)
    return jnp.take(h_t8, s, axis=1, **kw), False


def _forward_split(logits: jax.Array,         # (E, NH) post-activation
                   h_src_t: jax.Array,        # (NHF8, E+eb) edge-major or
                   #                            (E+eb, NHF8) row-major
                   receivers: jax.Array,      # (E,) int32 dst-sorted
                   drop_mask: Optional[jax.Array],
                   num_nodes: int, nh: int, f: int,
                   *, eps: float, eb: int, nb: int, interpret: bool,
                   normalize: bool = True, vma: tuple = (),
                   meta: Optional[jax.Array] = None,
                   h_rowmajor: bool = False):
    e = logits.shape[0]
    t = pl.cdiv(num_nodes, nb)
    n_pad = t * nb
    nh8 = _round_up(nh, 8)
    nhf8 = _round_up(nh * f, 8)
    with_dropout = drop_mask is not None
    if meta is None:
        meta = pack_meta(logits, drop_mask, receivers, nh8, eb)

    bounds = jnp.arange(t + 1, dtype=jnp.int32) * nb
    if vma:
        bounds = jax.lax.pcast(bounds, tuple(vma), to="varying")
    tile_off = jnp.searchsorted(receivers, bounds, side="left"
                                ).astype(jnp.int32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(t,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),  # h_src_t
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),  # meta
        ],
        out_specs=pl.BlockSpec((nhf8 + nh8, nb), lambda i, *_: (0, i),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, eb, h_src_t.shape[1]) if h_rowmajor
                       else (2, nhf8, eb), h_src_t.dtype),
            pltpu.VMEM((2, meta.shape[0], eb), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
    )
    kernel = functools.partial(_kernel_split, eb=eb, nb=nb, nh=nh, f=f,
                               nh8=nh8, nhf8=nhf8, e_real=e, eps=eps,
                               with_dropout=with_dropout,
                               normalize=normalize, h_rowmajor=h_rowmajor)
    sds_kw = {"vma": frozenset(vma)} if vma else {}
    acc_t = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nhf8 + nh8, n_pad), jnp.float32,
                                       **sds_kw),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * (e + eb) * nb * (nhf8 + nh8),
            bytes_accessed=(e + eb) * (nhf8 + meta.shape[0]) * 4
            + n_pad * (nhf8 + nh8) * 4,
            transcendentals=(e + eb) * nh8),
        interpret=interpret,
    )(tile_off, h_src_t, meta)
    return (acc_t[:nh * f].T[:num_nodes],
            acc_t[nhf8:nhf8 + nh].T[:num_nodes],
            meta)


@functools.partial(jax.custom_vjp,
                   nondiff_argnums=(6, 7, 8, 9, 10, 11, 12, 13, 14))
def fused_segment_attention_table(logits, h_flat, senders, receivers,
                                  drop_mask, src_order,
                                  num_nodes: int, nh: int, f: int,
                                  eps: float = 1e-8, eb: int = 256,
                                  nb: int = 128, interpret: bool = False,
                                  num_src_nodes: Optional[int] = None,
                                  vma: tuple = ()):
    """Fused segment attention straight from the NODE feature table: the
    op owns the node->edge gather (gather_h_src_t — one XLA gather into
    the kernel's edge-major layout, no transpose/concat/pad passes) and
    the fused kernel. Replaces the reference's index_select+scatter_add
    pipeline (models/gat_layer.py:96-127) end to end.

    src_order: optional sender-sorting permutation; routes d(h_flat)
    through the sorted Pallas segment-sum instead of an unsorted XLA
    scatter (Graph.src_order).
    num_src_nodes: row count of h_flat when it differs from num_nodes —
    the dst-owner sharded layout runs the kernel over the LOCAL dst range
    (num_nodes = N/K) while gathering from the replicated global table.
    """
    h_src, rowmajor = gather_h_src_t(h_flat, senders,
                                     _round_up(nh * f, 8), eb)
    out, _, _ = _forward_split(
        logits, h_src, receivers, drop_mask, num_nodes, nh, f,
        eps=eps, eb=eb, nb=nb, interpret=interpret, vma=vma,
        h_rowmajor=rowmajor)
    return out


def _fsat_fwd(logits, h_flat, senders, receivers, drop_mask, src_order,
              num_nodes, nh, f, eps, eb, nb, interpret, num_src_nodes,
              vma):
    nhf8 = _round_up(nh * f, 8)
    h_src, rowmajor = gather_h_src_t(h_flat, senders, nhf8, eb)
    out, denom, meta = _forward_split(
        logits, h_src, receivers, drop_mask, num_nodes, nh, f,
        eps=eps, eb=eb, nb=nb, interpret=interpret, vma=vma,
        h_rowmajor=rowmajor)
    return out, (h_src, meta, senders, receivers, src_order, denom, out,
                 drop_mask is not None, rowmajor)


def _fsat_bwd(num_nodes, nh, f, eps, eb, nb, interpret, num_src_nodes,
              vma, res, g):
    from .segment_sum import segment_sum_pallas
    from .segment_attention_bwd import backward_split
    (h_src, meta, senders, receivers, src_order, denom, out,
     with_dropout, rowmajor) = res
    e = receivers.shape[0]
    nh8 = _round_up(nh, 8)
    nhf8 = _round_up(nh * f, 8)
    n_src = num_src_nodes if num_src_nodes is not None else num_nodes
    d_h, d_meta = backward_split(
        h_src, meta, receivers, g, out, denom, num_nodes, nh, f,
        eps=eps, eb=eb, nb=nb, with_dropout=with_dropout,
        interpret=interpret, vma=vma, h_rowmajor=rowmajor)
    d_logits = d_meta[0:nh, :e].T
    d_drop = d_meta[nh8:nh8 + nh, :e].T if with_dropout else None
    # d(h_flat): scatter the feature cotangent back to nodes. Row-major
    # d_h feeds the ROW-major sorted reduction kernel directly — no
    # E-sized transpose anywhere in the backward (the round-1 path paid
    # one, and an XLA transpose feeding a pallas operand materialises
    # catastrophically — PERF.md r2). Edge-major (lane/row modes) keeps
    # the transposed path. Without src_order: XLA unsorted scatter-add.
    if src_order is not None and rowmajor:
        # extend the permutation into d_h's zero overrun rows so the
        # rows kernel can over-read full blocks; their ids point past
        # every segment tile (ignored by the one-hot)
        d_table = _dh_reduce(d_h, src_order, senders, e, eb, n_src,
                             interpret, vma=vma)
        return (d_logits, d_table[:, :nh * f], None, None, d_drop, None)
    g_rows = (d_h[:e, :nhf8] if rowmajor
              else d_h[:nhf8, :e].T)                        # (E, NHF8)
    if src_order is not None:
        g_sorted = jnp.take(g_rows, src_order, axis=0)
        ids_sorted = jnp.take(senders, src_order, axis=0)
        d_table = segment_sum_pallas(g_sorted, ids_sorted, n_src,
                                     interpret=interpret, vma=vma)
    else:
        d_table = jnp.zeros((n_src, nhf8), jnp.float32
                            ).at[senders].add(g_rows)
    return d_logits, d_table[:, :nh * f], None, None, d_drop, None


fused_segment_attention_table.defvjp(_fsat_fwd, _fsat_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8, 9, 10))
def fused_segment_attention(logits, h_src, receivers, drop_mask,
                            num_nodes: int, nh: int, f: int,
                            eps: float = 1e-8, eb: int = 256, nb: int = 128,
                            interpret: bool = False):
    """out[n] = sum_{e: recv_e=n} softmax-weighted h_src_e, fused.

    Returns (N, NH*F) aggregated features (head-concat layout).
    drop_mask: optional (E, NH) prescaled keep mask (bernoulli/keep_prob),
    applied to the attention coefficients (reference gat_layer.py:113-115).
    """
    out, _ = _forward(logits, h_src, receivers, drop_mask, num_nodes,
                      nh, f, eps=eps, eb=eb, nb=nb, interpret=interpret)
    return out


def _use_fused_bwd() -> bool:
    """Fused Pallas backward (segment_attention_bwd) unless disabled.
    GAT_TPU_FUSED_BWD=0 falls back to the XLA quotient-rule VJP."""
    import os
    return os.environ.get("GAT_TPU_FUSED_BWD", "1") != "0"


def _fsa_fwd(logits, h_src, receivers, drop_mask,
             num_nodes, nh, f, eps, eb, nb, interpret):
    if _use_fused_bwd():
        out, denom, packed = _forward(
            logits, h_src, receivers, drop_mask, num_nodes, nh, f,
            eps=eps, eb=eb, nb=nb, interpret=interpret, return_packed=True)
        return out, (packed, receivers, denom, out,
                     drop_mask is not None)
    out, denom = _forward(logits, h_src, receivers, drop_mask, num_nodes,
                          nh, f, eps=eps, eb=eb, nb=nb, interpret=interpret)
    return out, (logits, h_src, receivers, drop_mask, denom, out)


def _fsa_bwd(num_nodes, nh, f, eps, eb, nb, interpret, res, g):
    if _use_fused_bwd():
        from .segment_attention_bwd import backward_packed
        packed, receivers, denom, out, with_dropout = res
        e = receivers.shape[0]
        nh8 = _round_up(nh, 8)
        nhf8 = _round_up(nh * f, 8)
        d_packed = backward_packed(
            packed, receivers, g, out, denom, num_nodes, nh, f,
            eps=eps, eb=eb, nb=nb, with_dropout=with_dropout,
            interpret=interpret)
        d_h = d_packed[:nh * f, :e].T
        d_logits = d_packed[nhf8:nhf8 + nh, :e].T
        d_drop = (d_packed[nhf8 + nh8:nhf8 + nh8 + nh, :e].T
                  if with_dropout else None)
        return d_logits, d_h, None, d_drop
    return _fsa_bwd_xla(num_nodes, nh, f, eps, res, g)


def _fsa_bwd_xla(num_nodes, nh, f, eps, res, g):
    """Quotient rule on saved denominators (exact, plain XLA):
        out[n] = num[n] / D[n],  D[n] = denom[n] + eps
        d h_e    = m_e ex_e / D[r_e] * g[r_e]            (per head)
        d ex_e   = m_e (h_e . g[r_e]) / D[r_e]
        d denom  = -(out . g) / D        (per node, head)
        d logit_e = ex_e * (d ex_e + d denom[r_e])
    """
    logits, h_src, receivers, drop_mask, denom, out = res
    e = logits.shape[0]
    g = g.reshape(num_nodes, nh * f)
    h3 = h_src.reshape(e, nh, f)
    # empty segments carry no gradient; avoid 0 * inf = NaN when eps = 0
    big_d = jnp.where(denom > 0.0, denom + eps, 1.0)        # (N, NH)

    ex = jnp.exp(logits)                                    # (E, NH)
    m = drop_mask if drop_mask is not None else None

    # node-side terms first, then ONE packed gather: three separate
    # E-sized takes cost ~3x the whole forward in XLA (docs/PERF.md)
    inv_d = 1.0 / big_d                                     # (N, NH)
    d_denom = -jnp.sum(out.reshape(num_nodes, nh, f)
                       * g.reshape(num_nodes, nh, f), axis=-1) / big_d
    node_pack = jnp.concatenate([g, inv_d, d_denom], axis=1)
    edge_pack = jnp.take(node_pack, receivers, axis=0)      # (E, nhf+2nh)
    nhf = nh * f
    g_e = edge_pack[:, :nhf].reshape(e, nh, f)              # (E, NH, F)
    inv_d_e = edge_pack[:, nhf:nhf + nh]                    # (E, NH)
    d_denom_e = edge_pack[:, nhf + nh:]                     # (E, NH)

    coef = ex * inv_d_e if m is None else ex * m * inv_d_e
    d_h = (coef[:, :, None] * g_e).reshape(e, nh * f)

    hdotg = jnp.sum(h3 * g_e, axis=-1)                      # (E, NH)
    d_ex_num = hdotg * inv_d_e
    if m is not None:
        d_ex_num = d_ex_num * m
    d_logits = ex * (d_ex_num + d_denom_e)

    d_drop = None
    if m is not None:
        d_drop = hdotg * ex * inv_d_e
    return d_logits, d_h, None, d_drop


fused_segment_attention.defvjp(_fsa_fwd, _fsa_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8, 9, 10))
def fused_segment_attention_partial(logits, h_src, receivers, drop_mask,
                                    num_nodes: int, nh: int, f: int,
                                    eb: int = 256, nb: int = 128,
                                    interpret: bool = False,
                                    vma: tuple = ()):
    """UNNORMALISED variant for edge-partitioned execution: returns
    (num (N, NH*F), denom (N, NH)) where
        num[n]   = sum_e onehot (drop) ex h,   denom[n] = sum_e onehot ex.
    Under shard_map each edge shard computes its partials with this op;
    psum over the edge axis then a plain XLA divide completes the
    softmax-weighted aggregation for cut neighbourhoods (the distributed
    analog of models/gat.py edge_axis paths)."""
    return _forward(logits, h_src, receivers, drop_mask, num_nodes,
                    nh, f, eps=0.0, eb=eb, nb=nb, interpret=interpret,
                    normalize=False, vma=vma)


def _fsap_fwd(logits, h_src, receivers, drop_mask,
              num_nodes, nh, f, eb, nb, interpret, vma):
    if _use_fused_bwd():
        num, denom, packed = _forward(
            logits, h_src, receivers, drop_mask, num_nodes, nh, f,
            eps=0.0, eb=eb, nb=nb, interpret=interpret, normalize=False,
            vma=vma, return_packed=True)
        return (num, denom), (packed, receivers, drop_mask is not None)
    num, denom = _forward(logits, h_src, receivers, drop_mask, num_nodes,
                          nh, f, eps=0.0, eb=eb, nb=nb,
                          interpret=interpret, normalize=False, vma=vma)
    return (num, denom), (logits, h_src, receivers, drop_mask)


def _fsap_bwd(num_nodes, nh, f, eb, nb, interpret, vma, res, g):
    if _use_fused_bwd():
        from .segment_attention_bwd import backward_packed
        packed, receivers, with_dropout = res
        g_num, g_denom = g
        e = receivers.shape[0]
        nh8 = _round_up(nh, 8)
        nhf8 = _round_up(nh * f, 8)
        d_packed = backward_packed(
            packed, receivers, g_num, g_num, g_denom, num_nodes, nh, f,
            eps=0.0, eb=eb, nb=nb, with_dropout=with_dropout,
            interpret=interpret, normalize=False, vma=tuple(vma))
        d_h = d_packed[:nh * f, :e].T
        d_logits = d_packed[nhf8:nhf8 + nh, :e].T
        d_drop = (d_packed[nhf8 + nh8:nhf8 + nh8 + nh, :e].T
                  if with_dropout else None)
        return d_logits, d_h, None, d_drop
    return _fsap_bwd_xla(num_nodes, nh, f, res, g)


def _fsap_bwd_xla(num_nodes, nh, f, res, g):
    """num[n] = sum onehot m ex h;  denom[n] = sum onehot ex:
        d h_e     = m_e ex_e g_num[r_e]
        d ex_e    = m_e (h_e . g_num[r_e]) + g_denom[r_e]
        d logit_e = ex_e * d ex_e
        d drop_e  = ex_e (h_e . g_num[r_e])
    """
    logits, h_src, receivers, drop_mask = res
    g_num, g_denom = g
    e = logits.shape[0]
    h3 = h_src.reshape(e, nh, f)
    ex = jnp.exp(logits)
    m = drop_mask

    nhf = nh * f
    node_pack = jnp.concatenate(
        [g_num.reshape(num_nodes, nhf), g_denom], axis=1)
    edge_pack = jnp.take(node_pack, receivers, axis=0)      # (E, nhf+nh)
    gn_e = edge_pack[:, :nhf].reshape(e, nh, f)             # (E, NH, F)
    gd_e = edge_pack[:, nhf:]                               # (E, NH)
    hdotg = jnp.sum(h3 * gn_e, axis=-1)                     # (E, NH)

    coef = ex if m is None else ex * m
    d_h = (coef[:, :, None] * gn_e).reshape(e, nh * f)
    d_ex = (hdotg if m is None else hdotg * m) + gd_e
    d_logits = ex * d_ex
    d_drop = None if m is None else ex * hdotg
    return d_logits, d_h, None, d_drop


fused_segment_attention_partial.defvjp(_fsap_fwd, _fsap_bwd)


def reference_segment_attention(logits, h_src, receivers, drop_mask,
                                num_nodes, nh, f, eps=1e-8):
    """Plain-XLA oracle with identical semantics (for tests)."""
    ex = jnp.exp(logits)
    denom = jax.ops.segment_sum(ex, receivers, num_segments=num_nodes,
                                indices_are_sorted=True)
    num = ex if drop_mask is None else ex * drop_mask
    weighted = (h_src.reshape(-1, nh, f) * num[:, :, None])
    agg = jax.ops.segment_sum(weighted, receivers, num_segments=num_nodes,
                              indices_are_sorted=True)
    inv = 1.0 / (denom + eps)
    return (agg * inv[:, :, None]).reshape(num_nodes, nh * f)


# --------------------------------------------------------------------------
# v5: IN-KERNEL LOGITS. The round-2 scale bisection (docs/PERF.md) showed
# narrow (E, NH) edge arrays are poison on TPU: XLA runs their gathers at
# ~200M rows/s regardless of width and their (even sorted!) segment
# reductions at ~360 ms per 5M edges. v5 never materialises them: the
# kernel computes per-edge logits itself — s_src from the gathered h rows
# via a tiny MXU contraction, s_dst broadcast from a per-tile node block,
# global cap as a scalar operand, LeakyReLU inline — and the backward
# produces d(s_dst) as per-tile reductions and d(a_src)/d(cap) as
# VMEM-accumulated outputs. Replaces reference models/gat_layer.py:76-109
# wholesale. Non-faithful (reference-quirk) mode only; paper_faithful
# keeps the v4 path.
# --------------------------------------------------------------------------

def _kernel_v5(pref_ref,           # (T+2,) int32: tile offsets | e_real
               h_hbm,              # (E_cols, NHFL) row-major gathered rows
               meta_hbm,           # (MR, E_cols): [drop rows?] recv row
               a_src_ref,          # (NHFL, NH8) VMEM whole
               s_dst_ref,          # (NH8, NB) VMEM per tile
               cap_ref,            # (1, 1) SMEM
               acc_ref,            # (NHF8+NH8, NB) VMEM out per tile
               hbuf, mbuf, sems,
               *, eb: int, nb: int, nh: int, f: int, nh8: int,
               nhf8: int, nhfl: int, eps: float, slope: float,
               with_dropout: bool):
    i = pl.program_id(0)
    lo = (pref_ref[i] // eb) * eb
    hi = pref_ref[i + 1]
    t = pl.num_programs(0)
    e_real = pref_ref[t + 1]
    nblocks = pl.cdiv(hi - lo, eb)

    exp_rows = jax.lax.broadcasted_iota(jnp.int32, (nh8, nhf8), 0)
    exp_cols = jax.lax.broadcasted_iota(jnp.int32, (nh8, nhf8), 1)
    expander = ((exp_cols // f == exp_rows)
                & (exp_rows < nh) & (exp_cols < nh * f)).astype(jnp.float32)

    acc_ref[:] = jnp.zeros_like(acc_ref)
    a_src_t = a_src_ref[:].astype(jnp.float32)              # (NHFL, NH8)
    cap = cap_ref[0, 0]

    def dma_h(slot, b):
        start = pl.multiple_of(lo + b * eb, eb)
        return pltpu.make_async_copy(h_hbm.at[pl.ds(start, eb), :],
                                     hbuf.at[slot], sems.at[slot, 0])

    def dma_m(slot, b):
        start = pl.multiple_of(lo + b * eb, eb)
        return pltpu.make_async_copy(meta_hbm.at[:, pl.ds(start, eb)],
                                     mbuf.at[slot], sems.at[slot, 1])

    @pl.when(nblocks > 0)
    def _():
        dma_h(0, 0).start()
        dma_m(0, 0).start()

    def body(b, _):
        slot = b % 2

        @pl.when(b + 1 < nblocks)
        def _():
            dma_h((b + 1) % 2, b + 1).start()
            dma_m((b + 1) % 2, b + 1).start()

        dma_h(slot, b).wait()
        dma_m(slot, b).wait()

        start = pl.multiple_of(lo + b * eb, eb)
        hb = hbuf[slot].astype(jnp.float32)                 # (EB, NHFL)
        h_full_t = hb.T                                     # (NHFL, EB)
        h_t = h_full_t[:nhf8]
        meta = mbuf[slot]
        recv_at = nh8 if with_dropout else 0
        recv_row = meta[recv_at:recv_at + 1, :]
        rows = (i * nb
                + jax.lax.broadcasted_iota(jnp.int32, (nb, eb), 0)
                ).astype(jnp.float32)
        onehot_t = (recv_row == rows).astype(jnp.float32)   # (NB, EB)

        # logits assembled ON-CHIP: s_src via a lane-contraction MXU op
        # over the row-major block, s_dst broadcast node->edge
        s_src = jax.lax.dot_general(
            a_src_t, hb, (((0,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)             # (NH8, EB)
        s_dst_e = jax.lax.dot_general(
            s_dst_ref[:], onehot_t, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)             # (NH8, EB)
        pre = (s_src + s_dst_e) - cap
        lgt = jnp.where(pre > 0.0, pre, slope * pre)
        ex = jnp.exp(lgt)
        col = start + jax.lax.broadcasted_iota(jnp.int32, (1, eb), 1)
        ex = jnp.where(col < e_real, ex, 0.0)               # (NH8, EB)

        num_t = ex
        if with_dropout:
            num_t = num_t * meta[0:nh8, :]
        num_wide = jax.lax.dot_general(
            expander, num_t, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)             # (NHF8, EB)
        weighted_t = h_t * num_wide
        dt = _matmul_dtype()
        combined = jnp.concatenate([weighted_t, ex], axis=0).astype(dt)
        acc_ref[:] += jax.lax.dot_general(
            combined, onehot_t.astype(dt), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)     # (NHF8+NH8, NB)
        return 0

    jax.lax.fori_loop(0, nblocks, body, 0)

    d = acc_ref[nhf8:, :]
    inv = jnp.where(d > 0.0, 1.0 / (d + eps), 0.0)
    inv_wide = jax.lax.dot_general(
        expander, inv, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    acc_ref[:nhf8, :] = acc_ref[:nhf8, :] * inv_wide


def _dh_reduce(d_h_rows, src_order, senders, e, op_eb, n_src,
               interpret, vma=()):
    """d(h) node reduction shared by every fused backward: permute the
    kernel's dst-block-ordered rows to src order (jnp.take — measured AT
    the 4 KB/row random floor; PROMISE_IN_BOUNDS and bf16 rows were both
    no-wins, probe_bwd_path round 5) and sorted-reduce by sender with
    the best measured kernel config: the NO-TRANSPOSE rows kernel at
    eb=1024 / nb=512 (18.37 vs the old 20.25 ms at 5.5M edges x 128
    lanes; bf16 one-hot dots a wash — the reduce is per-block-overhead
    bound, not MXU bound). GAT_TPU_DH_REDUCE_{EB,NB,NT} retune."""
    import os
    from .segment_sum import segment_sum_pallas_rows
    r_eb = int(os.environ.get("GAT_TPU_DH_REDUCE_EB", "1024"))
    r_nb = int(os.environ.get("GAT_TPU_DH_REDUCE_NB", "512"))
    r_nt = os.environ.get("GAT_TPU_DH_REDUCE_NT", "1") != "0"
    idx = jnp.concatenate([
        src_order, jnp.arange(e, e + op_eb, dtype=src_order.dtype)])
    if r_eb > op_eb:
        # extra index rows repeat the first zero-overrun row so the
        # reduce kernel's block over-read stays zeros at its bigger eb
        idx = jnp.concatenate([idx, jnp.full((r_eb - op_eb,), e,
                                             src_order.dtype)])
    g_sorted = jnp.take(d_h_rows, idx, axis=0)
    ids_sorted = jnp.take(senders, src_order, axis=0)
    return segment_sum_pallas_rows(g_sorted, ids_sorted, n_src,
                                   eb=r_eb, nb=r_nb, interpret=interpret,
                                   vma=vma, no_transpose=r_nt)


def _pack_meta_v5(drop_mask, receivers, nh8, eb):
    parts = []
    if drop_mask is not None:
        dm = drop_mask.T
        if dm.shape[0] != nh8:
            dm = jnp.pad(dm, ((0, nh8 - dm.shape[0]), (0, 0)))
        parts.append(dm)
    parts.append(receivers.astype(jnp.float32)[None, :])
    meta = jnp.concatenate(parts, axis=0) if len(parts) > 1 else parts[0]
    mr = (nh8 if drop_mask is not None else 0) + 8
    return jnp.pad(meta, ((0, mr - meta.shape[0]), (0, eb)))


def _v5_operands(h_flat, a_src, s_dst, senders, receivers, e_real,
                 nh, f, eb, nb):
    """(h_src rows, padded a_src, nh8, nhf8, nhfl) for the v5 kernels."""
    nhf = nh * f
    nh8 = _round_up(nh, 8)
    nhf8 = _round_up(nhf, 8)
    nhfl = _round_up(nhf, 128)
    h8 = h_flat if nhf == nhfl else jnp.pad(
        h_flat, ((0, 0), (0, nhfl - nhf)))
    import os
    if (os.environ.get("GAT_TPU_H_DTYPE") == "bfloat16"
            and h8.dtype == jnp.float32):
        h8 = h8.astype(jnp.bfloat16)
    h_src = jnp.take(h8, jnp.pad(senders, (0, eb)), axis=0)  # (E+eb, NHFL)
    a_pad = jnp.pad(a_src, ((0, nhfl - a_src.shape[0]),
                            (0, nh8 - a_src.shape[1])))
    return h_src, a_pad, nh8, nhf8, nhfl


def _forward_v5(h_src, meta, a_pad, s_dst, cap, receivers, e_real,
                num_nodes, nh, f, *, eps, slope, eb, nb, interpret,
                with_dropout):
    t = pl.cdiv(num_nodes, nb)
    n_pad = t * nb
    nh8 = _round_up(nh, 8)
    nhf8 = _round_up(nh * f, 8)
    nhfl = h_src.shape[1]

    s_dst_t = jnp.pad(s_dst.T, ((0, nh8 - nh), (0, n_pad - num_nodes)))

    bounds = jnp.arange(t + 1, dtype=jnp.int32) * nb
    tile_off = jnp.searchsorted(receivers, bounds, side="left"
                                ).astype(jnp.int32)
    pref = jnp.concatenate([tile_off, e_real[None].astype(jnp.int32)])

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(t,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),  # h_src
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),  # meta
            pl.BlockSpec((nhfl, nh8), lambda i, *_: (0, 0),
                         memory_space=pltpu.VMEM),             # a_pad
            pl.BlockSpec((nh8, nb), lambda i, *_: (0, i),
                         memory_space=pltpu.VMEM),             # s_dst_t
            pl.BlockSpec((1, 1), lambda i, *_: (0, 0),
                         memory_space=pltpu.SMEM),             # cap
        ],
        out_specs=pl.BlockSpec((nhf8 + nh8, nb), lambda i, *_: (0, i),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, eb, nhfl), h_src.dtype),
            pltpu.VMEM((2, meta.shape[0], eb), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
    )
    kernel = functools.partial(
        _kernel_v5, eb=eb, nb=nb, nh=nh, f=f, nh8=nh8, nhf8=nhf8,
        nhfl=nhfl, eps=eps, slope=slope, with_dropout=with_dropout)
    e = receivers.shape[0]
    acc_t = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nhf8 + nh8, n_pad), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * 3 * (e + eb) * nb * (nhf8 + nh8),
            bytes_accessed=(e + eb) * (nhfl + meta.shape[0]) * 4
            + n_pad * (nhf8 + nh8) * 4,
            transcendentals=(e + eb) * nh8),
        interpret=interpret,
    )(pref, h_src, meta, a_pad, s_dst_t, cap.reshape(1, 1))
    return (acc_t[:nh * f].T[:num_nodes],
            acc_t[nhf8:nhf8 + nh].T[:num_nodes])


@functools.partial(jax.custom_vjp,
                   nondiff_argnums=(9, 10, 11, 12, 13, 14, 15, 16, 17))
def fused_gat_table(h_flat, a_src, s_dst, cap, drop_mask,
                    senders, receivers, src_order, e_real,
                    num_nodes: int, nh: int, f: int,
                    eps: float = 1e-8, slope: float = 0.01,
                    eb: int = 1024, nb: int = 256,
                    interpret: bool = False,
                    num_src_nodes: int | None = None):
    """Whole-attention fused op, logits computed IN-KERNEL:

        out[n] = sum_e 1[recv_e = n] drop_e ex_e h[send_e] / (D[n]+eps)
        ex_e   = exp(leaky_slope((h[send_e].a_src + s_dst[recv_e]) - cap))

    No (E, NH) array ever exists in XLA — the whole per-edge pipeline of
    reference models/gat_layer.py:70-127 runs inside the kernel. The
    backward emits d(h) row-major for the sorted-scatter kernel, d(s_dst)
    as per-tile node reductions, and d(a_src)/d(cap) as VMEM-accumulated
    outputs. e_real: dynamic count of real (non-padding) edges —
    canonicalisation guarantees padding edges are the array tail.
    num_src_nodes: row count of h_flat when it differs from num_nodes —
    the dst-owner sharded layout gathers from the full replicated node
    table while reducing only this shard's dst rows (models/gat.py).
    """
    out, _ = _fgt_fwd(h_flat, a_src, s_dst, cap, drop_mask, senders,
                      receivers, src_order, e_real, num_nodes, nh, f,
                      eps, slope, eb, nb, interpret, num_src_nodes)
    return out


def _fgt_fwd(h_flat, a_src, s_dst, cap, drop_mask, senders, receivers,
             src_order, e_real, num_nodes, nh, f, eps, slope, eb, nb,
             interpret, num_src_nodes=None):
    nh8 = _round_up(nh, 8)
    h_src, a_pad, _, _, _ = _v5_operands(
        h_flat, a_src, s_dst, senders, receivers, e_real, nh, f, eb, nb)
    meta = _pack_meta_v5(drop_mask, receivers, nh8, eb)
    out, denom = _forward_v5(
        h_src, meta, a_pad, s_dst, cap, receivers, e_real, num_nodes,
        nh, f, eps=eps, slope=slope, eb=eb, nb=nb, interpret=interpret,
        with_dropout=drop_mask is not None)
    return out, (h_src, meta, a_pad, s_dst, cap, senders, receivers,
                 src_order, e_real, denom, out, drop_mask is not None)


def _fgt_bwd(num_nodes, nh, f, eps, slope, eb, nb, interpret,
             num_src_nodes, res, g):
    from .segment_sum import segment_sum_pallas_rows
    from .segment_attention_bwd import backward_v5
    (h_src, meta, a_pad, s_dst, cap, senders, receivers, src_order,
     e_real, denom, out, with_dropout) = res
    e = receivers.shape[0]
    nh8 = _round_up(nh, 8)
    d_h_rows, d_drop_t, d_sdst_t, d_apad, d_cap = backward_v5(
        h_src, meta, a_pad, s_dst, cap, receivers, e_real, g, out, denom,
        num_nodes, nh, f, eps=eps, slope=slope, eb=eb, nb=nb,
        with_dropout=with_dropout, interpret=interpret)
    # d(h): row-major cotangent -> sorted scatter (no narrow arrays);
    # the table covers num_src_nodes rows (== num_nodes unless the
    # dst-owner sharded layout gathers from the full replicated table)
    d_table = _dh_reduce(
        d_h_rows, src_order, senders, e, eb,
        num_nodes if num_src_nodes is None else num_src_nodes, interpret)
    d_h_flat = d_table[:, :nh * f]
    d_a_src = d_apad[:nh * f, :nh]
    d_s_dst = d_sdst_t[:nh].T[:num_nodes]
    d_drop = d_drop_t[:nh, :e].T if with_dropout else None
    return (d_h_flat, d_a_src, d_s_dst, d_cap[0, 0], d_drop,
            None, None, None, None)


fused_gat_table.defvjp(_fgt_fwd, _fgt_bwd)


# --------------------------------------------------------------------------
# v5 autocap: the global pre-LeakyReLU logit max (reference
# models/gat_layer.py:84-85) computed IN-KERNEL as a pre-pass over the
# same gathered row table the main v5 kernel streams. The XLA
# formulation (_global_cap in models/gat.py) costs two row-rate-bound
# narrow gathers plus an (E, NH) mask/max — ~10-25 ms per layer at 5M
# edges; this pass is one extra HBM read of the table (~3 ms) and
# returns the argmax (edge, head) code so the cap's sparse gradient
# stays two one-element scatters.
# --------------------------------------------------------------------------

_I32_MAX = np.int32(2 ** 31 - 1)


def _kernel_v5_cap(pref_ref,          # (T+2,) int32: tile offsets | e_real
                   h_hbm,             # (E_cols, NHFL) row-major rows
                   meta_hbm,          # (MR, E_cols): [drop rows?] recv row
                   a_src_ref,         # (NHFL, NH8) VMEM whole
                   s_dst_ref,         # (NH8, NB) VMEM per tile
                   vout_ref,          # (8, 128) f32 per tile: max at [0,0]
                   cout_ref,          # (8, 128) i32 per tile: code at [0,0]
                   hbuf, mbuf, sems,
                   *, eb: int, nb: int, nh: int, nh8: int,
                   with_dropout: bool):
    i = pl.program_id(0)
    lo = (pref_ref[i] // eb) * eb
    hi = pref_ref[i + 1]
    t = pl.num_programs(0)
    e_real = pref_ref[t + 1]
    nblocks = pl.cdiv(hi - lo, eb)

    a_src_t = a_src_ref[:].astype(jnp.float32)

    def dma_h(slot, b):
        start = pl.multiple_of(lo + b * eb, eb)
        return pltpu.make_async_copy(h_hbm.at[pl.ds(start, eb), :],
                                     hbuf.at[slot], sems.at[slot, 0])

    def dma_m(slot, b):
        start = pl.multiple_of(lo + b * eb, eb)
        return pltpu.make_async_copy(meta_hbm.at[:, pl.ds(start, eb)],
                                     mbuf.at[slot], sems.at[slot, 1])

    @pl.when(nblocks > 0)
    def _():
        dma_h(0, 0).start()
        dma_m(0, 0).start()

    def body(b, carry):
        vmax, vcode = carry
        slot = b % 2

        @pl.when(b + 1 < nblocks)
        def _():
            dma_h((b + 1) % 2, b + 1).start()
            dma_m((b + 1) % 2, b + 1).start()

        dma_h(slot, b).wait()
        dma_m(slot, b).wait()

        start = pl.multiple_of(lo + b * eb, eb)
        hb = hbuf[slot].astype(jnp.float32)                 # (EB, NHFL)
        meta = mbuf[slot]
        recv_at = nh8 if with_dropout else 0
        recv_row = meta[recv_at:recv_at + 1, :]             # (1, EB) f32
        rows = (i * nb
                + jax.lax.broadcasted_iota(jnp.int32, (nb, eb), 0)
                ).astype(jnp.float32)
        onehot_t = (recv_row == rows).astype(jnp.float32)   # (NB, EB)

        s_src = jax.lax.dot_general(
            a_src_t, hb, (((0,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)             # (NH8, EB)
        s_dst_e = jax.lax.dot_general(
            s_dst_ref[:], onehot_t, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)             # (NH8, EB)
        raw = s_src + s_dst_e

        col = start + jax.lax.broadcasted_iota(jnp.int32, (1, eb), 1)
        head = jax.lax.broadcasted_iota(jnp.int32, (nh8, eb), 0)
        # a block may overlap the previous tile's edge range (lo is
        # rounded down); count each edge only in the tile that owns its
        # destination, else the broadcast s_dst term is wrong
        in_tile = ((recv_row >= i * nb) & (recv_row < i * nb + nb))
        valid = (head < nh) & (col < e_real) & in_tile
        masked = jnp.where(valid, raw, NEG_INF)
        code = col * nh8 + head                             # (NH8, EB) i32
        bm = jnp.max(masked)
        bcode = jnp.min(jnp.where(masked == bm, code, _I32_MAX))
        tie = jnp.where(bm == vmax, jnp.minimum(bcode, vcode), vcode)
        return (jnp.maximum(vmax, bm),
                jnp.where(bm > vmax, bcode, tie))

    vmax, vcode = jax.lax.fori_loop(
        0, nblocks, body, (jnp.float32(NEG_INF), _I32_MAX * jnp.int32(1)))

    slot00 = ((jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0) == 0)
              & (jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1) == 0))
    vout_ref[:] = jnp.where(slot00, vmax, NEG_INF)
    cout_ref[:] = jnp.where(slot00, vcode, _I32_MAX)


def _cap_v5(h_src, meta, a_pad, s_dst, receivers, e_real, num_nodes,
            nh, *, eb, nb, interpret, with_dropout):
    """(cap, code): global max of the raw edge logits and its
    argmax code (edge_index * NH8 + head)."""
    t = pl.cdiv(num_nodes, nb)
    n_pad = t * nb
    nh8 = _round_up(nh, 8)
    nhfl = h_src.shape[1]

    s_dst_t = jnp.pad(s_dst.T, ((0, nh8 - nh), (0, n_pad - num_nodes)))
    bounds = jnp.arange(t + 1, dtype=jnp.int32) * nb
    tile_off = jnp.searchsorted(receivers, bounds, side="left"
                                ).astype(jnp.int32)
    pref = jnp.concatenate([tile_off, e_real[None].astype(jnp.int32)])

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(t,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),  # h_src
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),  # meta
            pl.BlockSpec((nhfl, nh8), lambda i, *_: (0, 0),
                         memory_space=pltpu.VMEM),             # a_pad
            pl.BlockSpec((nh8, nb), lambda i, *_: (0, i),
                         memory_space=pltpu.VMEM),             # s_dst_t
        ],
        out_specs=[
            pl.BlockSpec((8, 128), lambda i, *_: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, 128), lambda i, *_: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, eb, nhfl), h_src.dtype),
            pltpu.VMEM((2, meta.shape[0], eb), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
    )
    kernel = functools.partial(
        _kernel_v5_cap, eb=eb, nb=nb, nh=nh, nh8=nh8,
        with_dropout=with_dropout)
    e = receivers.shape[0]
    vout, cout = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((8, t * 128), jnp.float32),
                   jax.ShapeDtypeStruct((8, t * 128), jnp.int32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * (e + eb) * nb * nh8,
            bytes_accessed=(e + eb) * (nhfl + meta.shape[0]) * 4,
            transcendentals=0),
        interpret=interpret,
    )(pref, h_src, meta, a_pad, s_dst_t)
    vals = vout[0].reshape(t, 128)[:, 0]
    codes = cout[0].reshape(t, 128)[:, 0]
    cap = jnp.max(vals)
    code = jnp.min(jnp.where(vals == cap, codes, _I32_MAX))
    return cap, code


def _kernel_v5_auto(pref_ref,          # (T+2,) int32: tile offsets | e_real
                    h_hbm,             # (E_cols, NHFL) row-major rows
                    meta_hbm,          # (MR, E_cols): [drop rows?] recv row
                    a_src_ref,         # (NHFL, NH8) VMEM whole
                    s_dst_ref,         # (NH8, NB) VMEM per tile (i % T)
                    acc_ref,           # (NHF8+NH8, NB) VMEM out per tile
                    cap_ref, code_ref,  # (8, 128) VMEM outs, constant index
                    hbuf, mbuf, sems, capacc, codeacc,
                    *, eb: int, nb: int, nh: int, f: int, nh8: int,
                    nhf8: int, nhfl: int, eps: float, slope: float,
                    with_dropout: bool, sweep1: bool = False):
    """Merged autocap forward: ONE launch instead of cap-kernel + main
    kernel. grid = (2T,): tiles [0, T) stream the edge blocks computing
    the running global (max, argmax-code) of the raw logits into
    persistent VMEM scratch (the TPU grid is sequential), tiles [T, 2T)
    run the attention with the completed cap — the 2-phase pattern
    proven on-chip by the v6 windowed kernel
    (segment_attention_window._kernel_v6). Saves two Mosaic launches +
    the XLA cap-reduction glue per layer (the Cora-scale step is
    launch-bound — docs/PERF.md round 3 profile).

    sweep1 (v10): SINGLE-SWEEP forward, grid = (T,). The pre-LeakyReLU
    global cap makes every capped logit <= 0, so LeakyReLU is affine on
    the whole reachable domain and exp separates: the same sweep that
    tracks (max, argmax) accumulates UNNORMALISED num/den with
    exp(slope*raw') (raw' B-shifted by the caller via s_dst so ex <= 1)
    and the XLA epilogue divides by (den + eps*exp(slope*cap')). Halves
    the gathered-row-table stream — v5's dominant traffic — plus the
    meta reads and one-hot builds (see segment_attention_window
    ._kernel_v6 for the derivation; parity pinned by the same oracle
    suite)."""
    i = pl.program_id(0)
    n_total = pl.num_programs(0)
    t = n_total if sweep1 else n_total // 2
    ti = jax.lax.rem(i, t)
    phase = jnp.int32(0) if sweep1 else i // t
    lo = (pref_ref[ti] // eb) * eb
    hi = pref_ref[ti + 1]
    e_real = pref_ref[t + 1]
    nblocks = pl.cdiv(hi - lo, eb)

    exp_rows = jax.lax.broadcasted_iota(jnp.int32, (nh8, nhf8), 0)
    exp_cols = jax.lax.broadcasted_iota(jnp.int32, (nh8, nhf8), 1)
    expander = ((exp_cols // f == exp_rows)
                & (exp_rows < nh) & (exp_cols < nh * f)).astype(jnp.float32)
    a_src_t = a_src_ref[:].astype(jnp.float32)              # (NHFL, NH8)

    @pl.when(i == 0)
    def _():
        capacc[:] = jnp.full_like(capacc, NEG_INF)
        codeacc[:] = jnp.full_like(codeacc, _I32_MAX)

    def dma_h(slot, b):
        start = pl.multiple_of(lo + b * eb, eb)
        return pltpu.make_async_copy(h_hbm.at[pl.ds(start, eb), :],
                                     hbuf.at[slot], sems.at[slot, 0])

    def dma_m(slot, b):
        start = pl.multiple_of(lo + b * eb, eb)
        return pltpu.make_async_copy(meta_hbm.at[:, pl.ds(start, eb)],
                                     mbuf.at[slot], sems.at[slot, 1])

    @pl.when(nblocks > 0)
    def _():
        dma_h(0, 0).start()
        dma_m(0, 0).start()

    def edge_inputs(slot, b):
        start = pl.multiple_of(lo + b * eb, eb)
        hb = hbuf[slot].astype(jnp.float32)                 # (EB, NHFL)
        meta = mbuf[slot]
        recv_at = nh8 if with_dropout else 0
        recv_row = meta[recv_at:recv_at + 1, :]             # (1, EB)
        rows = (ti * nb
                + jax.lax.broadcasted_iota(jnp.int32, (nb, eb), 0)
                ).astype(jnp.float32)
        onehot_t = (recv_row == rows).astype(jnp.float32)   # (NB, EB)
        s_src = jax.lax.dot_general(
            a_src_t, hb, (((0,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)             # (NH8, EB)
        s_dst_e = jax.lax.dot_general(
            s_dst_ref[:], onehot_t, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)             # (NH8, EB)
        col = start + jax.lax.broadcasted_iota(jnp.int32, (1, eb), 1)
        return hb, meta, recv_row, onehot_t, s_src, s_dst_e, col

    def cap_body(b, carry):
        vmax, vcode = carry
        slot = b % 2

        @pl.when(b + 1 < nblocks)
        def _():
            dma_h((b + 1) % 2, b + 1).start()
            dma_m((b + 1) % 2, b + 1).start()

        dma_h(slot, b).wait()
        dma_m(slot, b).wait()
        (hb, meta, recv_row, onehot_t, s_src, s_dst_e, col
         ) = edge_inputs(slot, b)
        raw = s_src + s_dst_e
        head = jax.lax.broadcasted_iota(jnp.int32, (nh8, eb), 0)
        in_tile = ((recv_row >= ti * nb) & (recv_row < ti * nb + nb))
        valid = (head < nh) & (col < e_real) & in_tile
        masked = jnp.where(valid, raw, NEG_INF)
        code = col * nh8 + head
        bm = jnp.max(masked)
        bcode = jnp.min(jnp.where(masked == bm, code, _I32_MAX))
        tie = jnp.where(bm == vmax, jnp.minimum(bcode, vcode), vcode)

        if sweep1:
            # single-sweep attention accumulation (see docstring):
            # UNNORMALISED [num | den], exp of the B-shifted raw
            h_t = hb.T[:nhf8]
            ex = jnp.exp(slope * raw)
            ex = jnp.where(col < e_real, ex, 0.0)           # (NH8, EB)
            num_t = ex
            if with_dropout:
                num_t = num_t * meta[0:nh8, :]
            num_wide = jax.lax.dot_general(
                expander, num_t, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)         # (NHF8, EB)
            weighted_t = h_t * num_wide
            dt = _matmul_dtype()
            combined = jnp.concatenate([weighted_t, ex], axis=0
                                       ).astype(dt)
            acc_ref[:] += jax.lax.dot_general(
                combined, onehot_t.astype(dt), (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)  # (NHF8+NH8, NB)

        return (jnp.maximum(vmax, bm),
                jnp.where(bm > vmax, bcode, tie))

    def main_body(b, _):
        slot = b % 2

        @pl.when(b + 1 < nblocks)
        def _():
            dma_h((b + 1) % 2, b + 1).start()
            dma_m((b + 1) % 2, b + 1).start()

        dma_h(slot, b).wait()
        dma_m(slot, b).wait()
        (hb, meta, _, onehot_t, s_src, s_dst_e, col) = edge_inputs(slot, b)
        h_t = hb.T[:nhf8]
        cap = jnp.max(capacc[:])
        pre = (s_src + s_dst_e) - cap
        lgt = jnp.where(pre > 0.0, pre, slope * pre)
        ex = jnp.exp(lgt)
        ex = jnp.where(col < e_real, ex, 0.0)               # (NH8, EB)

        num_t = ex
        if with_dropout:
            num_t = num_t * meta[0:nh8, :]
        num_wide = jax.lax.dot_general(
            expander, num_t, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)             # (NHF8, EB)
        weighted_t = h_t * num_wide
        dt = _matmul_dtype()
        combined = jnp.concatenate([weighted_t, ex], axis=0).astype(dt)
        acc_ref[:] += jax.lax.dot_general(
            combined, onehot_t.astype(dt), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)     # (NHF8+NH8, NB)
        return 0

    def _phase0():
        if sweep1:
            acc_ref[:] = jnp.zeros_like(acc_ref)
        vmax, vcode = jax.lax.fori_loop(
            0, nblocks, cap_body,
            (jnp.float32(NEG_INF), _I32_MAX * jnp.int32(1)))
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
        jax.lax.fori_loop(0, nblocks, main_body, 0)
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


def _forward_v5_auto(h_src, meta, a_pad, s_dst, receivers, e_real,
                     num_nodes, nh, f, *, eps, slope, eb, nb, interpret,
                     with_dropout, sweep1=False):
    """Merged-cap forward: (out, denom, cap, code) in one launch."""
    t = pl.cdiv(num_nodes, nb)
    n_pad = t * nb
    nh8 = _round_up(nh, 8)
    nhf8 = _round_up(nh * f, 8)
    nhfl = h_src.shape[1]

    s_dst_t = jnp.pad(s_dst.T, ((0, nh8 - nh), (0, n_pad - num_nodes)))
    bounds = jnp.arange(t + 1, dtype=jnp.int32) * nb
    tile_off = jnp.searchsorted(receivers, bounds, side="left"
                                ).astype(jnp.int32)
    pref = jnp.concatenate([tile_off, e_real[None].astype(jnp.int32)])

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(t,) if sweep1 else (2 * t,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),  # h_src
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),  # meta
            pl.BlockSpec((nhfl, nh8), lambda i, *_: (0, 0),
                         memory_space=pltpu.VMEM),             # a_pad
            pl.BlockSpec((nh8, nb), lambda i, *_: (0, jax.lax.rem(i, t)),
                         memory_space=pltpu.VMEM),             # s_dst_t
        ],
        out_specs=[
            pl.BlockSpec((nhf8 + nh8, nb),
                         lambda i, *_: (0, jax.lax.rem(i, t)),
                         memory_space=pltpu.VMEM),             # acc
            pl.BlockSpec((8, 128), lambda i, *_: (0, 0),
                         memory_space=pltpu.VMEM),             # cap
            pl.BlockSpec((8, 128), lambda i, *_: (0, 0),
                         memory_space=pltpu.VMEM),             # code
        ],
        scratch_shapes=[
            pltpu.VMEM((2, eb, nhfl), h_src.dtype),
            pltpu.VMEM((2, meta.shape[0], eb), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 2)),
            pltpu.VMEM((8, 128), jnp.float32),                 # capacc
            pltpu.VMEM((8, 128), jnp.int32),                   # codeacc
        ],
    )
    kernel = functools.partial(
        _kernel_v5_auto, eb=eb, nb=nb, nh=nh, f=f, nh8=nh8, nhf8=nhf8,
        nhfl=nhfl, eps=eps, slope=slope, with_dropout=with_dropout,
        sweep1=sweep1)
    e = receivers.shape[0]
    acc_t, cap_o, code_o = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((nhf8 + nh8, n_pad), jnp.float32),
            jax.ShapeDtypeStruct((8, 128), jnp.float32),
            jax.ShapeDtypeStruct((8, 128), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * 5 * (e + eb) * nb * (nhf8 + nh8),
            bytes_accessed=2 * (e + eb) * (nhfl + meta.shape[0]) * 4
            + n_pad * (nhf8 + nh8) * 4,
            transcendentals=(e + eb) * nh8),
        interpret=interpret,
    )(pref, h_src, meta, a_pad, s_dst_t)
    return (acc_t[:nh * f].T[:num_nodes],
            acc_t[nhf8:nhf8 + nh].T[:num_nodes],
            cap_o[0, 0], code_o[0, 0])


def _v5_merged_cap() -> bool:
    """Merged 2-phase autocap forward (one launch) unless disabled."""
    import os
    return os.environ.get("GAT_TPU_V5_MERGED", "1") != "0"


def _v10_sweep1() -> bool:
    """v10 single-sweep forward gate (same env as the v7 twin —
    segment_attention_window._v10_sweep1; duplicated to avoid a
    circular import)."""
    import os
    return os.environ.get("GAT_TPU_V10", "1") != "0"


@functools.partial(jax.custom_vjp,
                   nondiff_argnums=(9, 10, 11, 12, 13, 14, 15, 16))
def fused_gat_table_autocap(h_flat, a_src, s_dst, drop_mask,
                            senders, receivers, src_order, e_real,
                            score_bound,
                            num_nodes: int, nh: int, f: int,
                            eps: float = 1e-8, slope: float = 0.01,
                            eb: int = 256, nb: int = 128,
                            interpret: bool = False):
    """fused_gat_table with the global logit max-cap computed in-kernel
    (reference models/gat_layer.py:84-85) instead of taken as an
    argument: a streaming pre-pass over the same gathered row table
    returns (max, argmax code), and the cap's exact sparse gradient —
    the summed cotangent lands on the one argmax (edge, head) — is two
    one-element scatters chained onto the main backward. Ties resolve
    to the lowest (edge, head) code (jnp.max's VJP splits ties instead;
    measure-zero on real data).

    score_bound: any global scalar >= max raw logit, used by the v10
    single-sweep mode (GAT_TPU_V10, default on) to keep the uncapped
    exp <= 1; None computes it from the node score tables."""
    out, _ = _fgta_fwd(h_flat, a_src, s_dst, drop_mask, senders,
                       receivers, src_order, e_real, score_bound,
                       num_nodes, nh, f,
                       eps, slope, eb, nb, interpret)
    return out


def _fgta_fwd(h_flat, a_src, s_dst, drop_mask, senders, receivers,
              src_order, e_real, score_bound, num_nodes, nh, f, eps,
              slope, eb, nb, interpret):
    sweep1 = _v10_sweep1() and _v5_merged_cap()
    if sweep1:
        if score_bound is None:
            s_src_n = jnp.dot(h_flat, a_src,
                              preferred_element_type=jnp.float32)
            score_bound = jnp.max(s_src_n) + jnp.max(s_dst)
        b = jax.lax.stop_gradient(score_bound)
        s_dst_eff = s_dst - b       # B cancels algebraically (epilogue)
    else:
        s_dst_eff = s_dst
    nh8 = _round_up(nh, 8)
    h_src, a_pad, _, _, _ = _v5_operands(
        h_flat, a_src, s_dst_eff, senders, receivers, e_real, nh, f,
        eb, nb)
    meta = _pack_meta_v5(drop_mask, receivers, nh8, eb)
    with_dropout = drop_mask is not None
    if _v5_merged_cap():
        out, denom, cap, code = _forward_v5_auto(
            h_src, meta, a_pad, s_dst_eff, receivers, e_real, num_nodes,
            nh, f, eps=eps, slope=slope, eb=eb, nb=nb,
            interpret=interpret, with_dropout=with_dropout,
            sweep1=sweep1)
    else:
        cap, code = _cap_v5(h_src, meta, a_pad, s_dst_eff, receivers,
                            e_real, num_nodes, nh, eb=eb, nb=nb,
                            interpret=interpret,
                            with_dropout=with_dropout)
        out, denom = _forward_v5(
            h_src, meta, a_pad, s_dst_eff, cap, receivers, e_real,
            num_nodes, nh, f, eps=eps, slope=slope, eb=eb, nb=nb,
            interpret=interpret, with_dropout=with_dropout)
    epsp = None
    if sweep1:
        # normalise: out/denom are UNNORMALISED [num | den]; the +eps of
        # the reference softmax scales to eps' = eps*exp(slope*cap') in
        # B-shifted space (exact algebra — _kernel_v5_auto docstring)
        epsp = eps * jnp.exp(slope * cap)
        inv = jnp.where(denom > 0.0, 1.0 / (denom + epsp), 0.0)
        out = (out.reshape(num_nodes, nh, f)
               * inv[:, :, None]).reshape(num_nodes, nh * f)
    return out, (h_src, meta, a_pad, s_dst_eff, cap, code, senders,
                 receivers, src_order, e_real, denom, out, with_dropout,
                 sweep1, epsp)


def _fgta_bwd(num_nodes, nh, f, eps, slope, eb, nb, interpret, res, g):
    from .segment_sum import segment_sum_pallas_rows
    from .segment_attention_bwd import backward_v5
    (h_src, meta, a_pad, s_dst, cap, code, senders, receivers,
     src_order, e_real, denom, out, with_dropout, sweep1, epsp) = res
    e = receivers.shape[0]
    nh8 = _round_up(nh, 8)
    # sweep1: the kernel's SMEM scalar carries eps' and denom is the
    # unnormalised den' (see backward_v5)
    scalar = epsp if sweep1 else cap
    d_h_rows, d_drop_t, d_sdst_t, d_apad, d_cap = backward_v5(
        h_src, meta, a_pad, s_dst, scalar, receivers, e_real, g, out,
        denom, num_nodes, nh, f, eps=eps, slope=slope, eb=eb, nb=nb,
        with_dropout=with_dropout, interpret=interpret, sweep1=sweep1)
    d_table = _dh_reduce(d_h_rows, src_order, senders, e, eb,
                         num_nodes, interpret)
    d_h_flat = d_table[:, :nh * f]
    d_a_src = d_apad[:nh * f, :nh]
    d_s_dst = d_sdst_t[:nh].T[:num_nodes]
    d_drop = d_drop_t[:nh, :e].T if with_dropout else None

    # cap chain: cap = h[snd*] . a_src[:, h*] + s_dst[rcv*, h*]; route the
    # (already globally summed) cap cotangent to that one argmax triple.
    # sweep1: the cap enters only through eps' in the XLA epilogue, so
    # d(cap') is closed-form (see segment_attention_window._fgw7_bwd)
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
    hrow = jnp.take(h_src, eidx, axis=0)[:nh * f].astype(jnp.float32)
    acol = jnp.take(a_pad, hidx, axis=1)[:nh * f].astype(jnp.float32)
    d_h_flat = d_h_flat.at[src_star].add(dc * acol)
    d_a_src = d_a_src.at[:, hidx].add(dc * hrow)
    d_s_dst = d_s_dst.at[dst_star, hidx].add(dc)
    return (d_h_flat, d_a_src, d_s_dst, d_drop, None, None, None, None,
            None)


fused_gat_table_autocap.defvjp(_fgta_fwd, _fgta_bwd)


@functools.partial(jax.custom_vjp,
                   nondiff_argnums=(8, 9, 10, 11, 12, 13, 14, 15, 16))
def v5_sweep1_parts(h_flat, a_src, s_dst, drop_mask,
                    senders, receivers, src_order, e_real,
                    num_nodes: int, nh: int, f: int,
                    eps: float = 1e-8, slope: float = 0.01,
                    eb: int = 256, nb: int = 128,
                    interpret: bool = False,
                    num_src_nodes: int = None):
    """UNNORMALISED single-sweep attention parts over (possibly
    shard-local) dst rows: (num (N, NH*F), den (N, NH), cap' scalar —
    the max of the B-shifted raw logits this call saw — and the argmax
    code). The caller completes the softmax, optionally AFTER
    collectives over an edge mesh axis:

        cap_g' = pmax(cap'); eps' = eps * exp(slope * cap_g')
        out = num / (den + eps')      (0 where den == 0)

    which is exactly the reference's capped softmax in B-shifted space
    (see _kernel_v5_auto sweep1). s_dst must arrive ALREADY B-shifted.
    INTERNAL CONTRACT: the VJP assumes num/den feed only such an
    epilogue (their cotangents are consumed raw via the
    normalize=False backward); cap's cotangent is routed to the argmax
    (edge, head) exactly like the autocap op. Used by the dst-owner
    sharded layer (models/gat.py) so the v10 single-sweep reaches the
    distributed path with ONE kernel launch per shard."""
    outs, _ = _v5sp_fwd(h_flat, a_src, s_dst, drop_mask, senders,
                        receivers, src_order, e_real, num_nodes, nh, f,
                        eps, slope, eb, nb, interpret, num_src_nodes)
    return outs


def _v5sp_fwd(h_flat, a_src, s_dst, drop_mask, senders, receivers,
              src_order, e_real, num_nodes, nh, f, eps, slope, eb, nb,
              interpret, num_src_nodes=None):
    nh8 = _round_up(nh, 8)
    h_src, a_pad, _, _, _ = _v5_operands(
        h_flat, a_src, s_dst, senders, receivers, e_real, nh, f, eb, nb)
    meta = _pack_meta_v5(drop_mask, receivers, nh8, eb)
    with_dropout = drop_mask is not None
    num, den, cap, code = _forward_v5_auto(
        h_src, meta, a_pad, s_dst, receivers, e_real, num_nodes,
        nh, f, eps=eps, slope=slope, eb=eb, nb=nb,
        interpret=interpret, with_dropout=with_dropout, sweep1=True)
    return ((num, den, cap, code),
            (h_src, meta, a_pad, s_dst, code, senders, receivers,
             src_order, e_real, with_dropout))


def _v5sp_bwd(num_nodes, nh, f, eps, slope, eb, nb, interpret,
              num_src_nodes, res, ct):
    from .segment_sum import segment_sum_pallas_rows
    from .segment_attention_bwd import backward_v5
    (h_src, meta, a_pad, s_dst, code, senders, receivers, src_order,
     e_real, with_dropout) = res
    d_num, d_den, d_cap_in, _d_code = ct
    e = receivers.shape[0]
    nh8 = _round_up(nh, 8)
    zero = jnp.float32(0.0)
    d_h_rows, d_drop_t, d_sdst_t, d_apad, _unused = backward_v5(
        h_src, meta, a_pad, s_dst, zero, receivers, e_real, d_num,
        jnp.zeros_like(d_num), d_den, num_nodes, nh, f, eps=eps,
        slope=slope, eb=eb, nb=nb, with_dropout=with_dropout,
        interpret=interpret, sweep1=True, normalize=False)
    # senders index the (possibly replicated GLOBAL) h table; dst rows
    # are num_nodes (possibly shard-local) — same split as
    # fused_gat_table's num_src_nodes
    n_src = num_src_nodes if num_src_nodes is not None else num_nodes
    d_table = _dh_reduce(d_h_rows, src_order, senders, e, eb, n_src,
                         interpret)
    d_h_flat = d_table[:, :nh * f]
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
    hrow = jnp.take(h_src, eidx, axis=0)[:nh * f].astype(jnp.float32)
    acol = jnp.take(a_pad, hidx, axis=1)[:nh * f].astype(jnp.float32)
    d_h_flat = d_h_flat.at[src_star].add(dc * acol)
    d_a_src = d_a_src.at[:, hidx].add(dc * hrow)
    d_s_dst = d_s_dst.at[dst_star, hidx].add(dc)
    return (d_h_flat, d_a_src, d_s_dst, d_drop, None, None, None, None)


v5_sweep1_parts.defvjp(_v5sp_fwd, _v5sp_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8, 9, 10, 11))
def v5_local_cap(h_flat, a_src, s_dst, senders, receivers, e_real,
                 num_nodes: int, nh: int, f: int,
                 eb: int = 256, nb: int = 128,
                 interpret: bool = False):
    """Standalone differentiable edge-logit max over THIS shard's edges
    (the dst-owner sharded layer composes it with the pmax/psum owner
    trick into the reference's global cap — models/gat.py). Same
    streaming pre-pass as fused_gat_table_autocap; the sparse gradient
    routes the cap cotangent to the one argmax (edge, head):
    d(h_flat[snd*]) += g * a_src[:, h*], d(a_src[:, h*]) += g * h[snd*],
    d(s_dst[rcv*, h*]) += g. `receivers` may be shard-local (re-based)
    ids; `s_dst` covers the same local row range."""
    cap, _ = _vlc_fwd(h_flat, a_src, s_dst, senders, receivers, e_real,
                      num_nodes, nh, f, eb, nb, interpret)
    return cap


def _vlc_fwd(h_flat, a_src, s_dst, senders, receivers, e_real,
             num_nodes, nh, f, eb, nb, interpret):
    nh8 = _round_up(nh, 8)
    h_src, a_pad, _, _, _ = _v5_operands(
        h_flat, a_src, s_dst, senders, receivers, e_real, nh, f, eb, nb)
    meta = _pack_meta_v5(None, receivers, nh8, eb)
    cap, code = _cap_v5(h_src, meta, a_pad, s_dst, receivers, e_real,
                        num_nodes, nh, eb=eb, nb=nb, interpret=interpret,
                        with_dropout=False)
    return cap, (h_src, a_pad, senders, receivers, code,
                 h_flat.shape, s_dst.shape)


def _vlc_bwd(num_nodes, nh, f, eb, nb, interpret, res, g):
    h_src, a_pad, senders, receivers, code, h_shape, s_shape = res
    nh8 = _round_up(nh, 8)
    eidx = code // nh8
    hidx = code % nh8
    src_star = jnp.take(senders, eidx)
    dst_star = jnp.take(receivers, eidx)
    hrow = jnp.take(h_src, eidx, axis=0)[:nh * f].astype(jnp.float32)
    acol = jnp.take(a_pad, hidx, axis=1)[:nh * f].astype(jnp.float32)
    d_h = jnp.zeros(h_shape, jnp.float32).at[src_star].add(g * acol)
    d_a = jnp.zeros((nh * f, nh), jnp.float32).at[:, hidx].add(g * hrow)
    d_s = jnp.zeros(s_shape, jnp.float32).at[dst_star, hidx].add(g)
    return (d_h, d_a, d_s, None, None, None)


v5_local_cap.defvjp(_vlc_fwd, _vlc_bwd)
