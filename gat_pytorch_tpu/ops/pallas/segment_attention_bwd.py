"""Fused backward kernel for the segment-attention op.

Computes the per-edge gradients of
    out[n] = sum_e onehot(recv_e=n) (m_e) ex_e h_e / (denom[n] + eps)
in one pass over the SAME packed edge array the forward built
(h | logits | drop | recv, edge-major lanes — segment_attention._forward),
with the node-side payload (g, 1/D, d_denom) broadcast node->edge by the
one-hot matmul (the transpose of the forward's reduction):

    per tile:  P = [g | 1/D | d_denom]           (K, NB) node payload
    per block: payload_e = P @ onehot             (K, EB) MXU broadcast
               elementwise quotient-rule terms -> d_h, d_logits, d_drop
               accumulate-write the d block to HBM

Output blocks are written manually because a tile's edge range is not
block-aligned: each tile's FIRST (aligned-down) block may also hold the
previous tile's edges, so the first block of every tile does a read-add-
write against a zero-initialised, input-aliased output buffer. The TPU
grid is sequential on a core, so the read of tile i+1 always observes
tile i's completed write.

This replaces the XLA quotient-rule VJP (one packed E-gather + ~5
elementwise passes) whose data movement cost ~6x the forward kernel
(docs/PERF.md).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .segment_attention import _round_up


def _kernel(tile_off_ref,
            packed_hbm,     # (R, E+EB) forward's packed edge array
            zeros_hbm,      # (KO, E+EB) zero-init, aliased to output
            g_t, out_t, denom_t,   # node-side BlockSpec inputs (·, NB)
            dout_hbm,       # output, aliased with zeros_hbm
            buf, dbuf, rbuf, sems, wsems, rsem,
            *, eb: int, nb: int, nh: int, f: int, nh8: int, nhf8: int,
            ko: int, e_real: int, eps: float, with_dropout: bool,
            normalize: bool):
    i = pl.program_id(0)
    lo = (tile_off_ref[i] // eb) * eb
    hi = tile_off_ref[i + 1]
    nblocks = pl.cdiv(hi - lo, eb)

    exp_rows = jax.lax.broadcasted_iota(jnp.int32, (nh8, nhf8), 0)
    exp_cols = jax.lax.broadcasted_iota(jnp.int32, (nh8, nhf8), 1)
    expander = ((exp_cols // f == exp_rows)
                & (exp_rows < nh) & (exp_cols < nh * f)).astype(jnp.float32)

    # ---- node payload for this tile --------------------------------------
    # normalised op:   inv_d = 1/(denom+eps),  d_den = -(out.g)_h * inv_d
    # partial op:      inv_d = 1,              d_den = g_denom
    #                  (denom_t carries g_denom; out_t is unused)
    d = denom_t[:]                                          # (NH8, NB)
    if normalize:
        inv_d = jnp.where(d > 0.0, 1.0 / (d + eps), 0.0)
        outg_h = jax.lax.dot_general(
            expander, out_t[:] * g_t[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)             # (NH8, NB)
        d_den = -outg_h * inv_d
    else:
        inv_d = jnp.ones_like(d)
        d_den = d

    def dma_in(slot, b):
        start = pl.multiple_of(lo + b * eb, eb)
        return pltpu.make_async_copy(packed_hbm.at[:, pl.ds(start, eb)],
                                     buf.at[slot], sems.at[slot])

    def dma_out(slot, b):
        start = pl.multiple_of(lo + b * eb, eb)
        return pltpu.make_async_copy(dbuf.at[slot],
                                     dout_hbm.at[:, pl.ds(start, eb)],
                                     wsems.at[slot])

    @pl.when(nblocks > 0)
    def _():
        dma_in(0, 0).start()

    def body(b, _):
        slot = b % 2
        wslot = b % 2

        @pl.when(b + 1 < nblocks)
        def _():
            dma_in((b + 1) % 2, b + 1).start()

        dma_in(slot, b).wait()
        # pipelined writes: wait only for the write issued two blocks ago
        # (same-slot buffer reuse); in-tile target ranges are disjoint,
        # the cross-tile overlap block is covered by the post-loop drain
        @pl.when(b >= 2)
        def _():
            dma_out(wslot, b - 2).wait()
        start = pl.multiple_of(lo + b * eb, eb)

        block = buf[slot]                                   # (R, EB)
        h_t = block[0:nhf8, :]
        logits = block[nhf8:nhf8 + nh8, :]
        ex_t = jnp.exp(logits)                              # (NH8, EB)
        col = start + jax.lax.broadcasted_iota(jnp.int32, (1, eb), 1)
        ex_t = jnp.where(col < e_real, ex_t, 0.0)
        recv_at = nhf8 + nh8 + (nh8 if with_dropout else 0)
        recv_row = block[recv_at:recv_at + 1, :]
        rows = (i * nb
                + jax.lax.broadcasted_iota(jnp.int32, (nb, eb), 0)
                ).astype(jnp.float32)
        onehot_t = (recv_row == rows).astype(jnp.float32)   # (NB, EB)

        # node -> edge broadcast of [g | 1/D | d_denom]
        payload = jnp.concatenate([g_t[:], inv_d, d_den], axis=0)
        payload_e = jax.lax.dot_general(
            payload, onehot_t, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)             # (K, EB)
        g_e = payload_e[0:nhf8, :]
        invd_e = payload_e[nhf8:nhf8 + nh8, :]
        dden_e = payload_e[nhf8 + nh8:nhf8 + 2 * nh8, :]

        m = block[nhf8 + nh8:nhf8 + 2 * nh8, :] if with_dropout else None

        coef = ex_t * invd_e if m is None else ex_t * m * invd_e
        coef_wide = jax.lax.dot_general(
            expander, coef, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)             # (NHF8, EB)
        d_h = coef_wide * g_e

        hdotg = jax.lax.dot_general(
            expander, h_t * g_e, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)             # (NH8, EB)
        d_ex = hdotg * invd_e
        if m is not None:
            d_ex = d_ex * m
        d_logits = ex_t * (d_ex + dden_e)

        parts = [d_h, d_logits]
        if with_dropout:
            parts.append(hdotg * ex_t * invd_e)
        dblk = jnp.concatenate(parts, axis=0)               # (K', EB)
        dblk = jnp.pad(dblk, ((0, ko - dblk.shape[0]), (0, 0)))

        # first (aligned-down) block may contain the previous tile's
        # edges: accumulate against what is already there (branching on
        # the block index keeps stale read-buffer bits out of the sum)
        @pl.when(b == 0)
        def _():
            rd = pltpu.make_async_copy(dout_hbm.at[:, pl.ds(start, eb)],
                                       rbuf, rsem)
            rd.start()
            rd.wait()
            dbuf[wslot] = dblk + rbuf[:]

        @pl.when(b > 0)
        def _():
            dbuf[wslot] = dblk

        dma_out(wslot, b).start()
        return 0

    jax.lax.fori_loop(0, nblocks, body, 0)

    @pl.when(nblocks >= 2)
    def _():
        dma_out((nblocks - 2) % 2, nblocks - 2).wait()

    @pl.when(nblocks >= 1)
    def _():
        dma_out((nblocks - 1) % 2, nblocks - 1).wait()


def _kernel_split(tile_off_ref,
                  h_hbm,          # features: (NHF8, E_cols) edge-major or
                  #                 (E_cols, NHF8) row-major (h_rowmajor)
                  meta_hbm,       # (MR, E_cols): logits | drop | recv
                  zeros_h_hbm,    # zero-init, aliased -> dh_hbm
                  zeros_m_hbm,    # zero-init, aliased -> dmeta_hbm
                  g_t, out_t, denom_t,
                  dh_hbm, dmeta_hbm,
                  hbuf, mbuf, dhbuf, dmbuf, rhbuf, rmbuf,
                  sems, wsems, rsems,
                  *, eb: int, nb: int, nh: int, f: int, nh8: int,
                  nhf8: int, nhfl: int, km: int, e_real: int, eps: float,
                  with_dropout: bool, normalize: bool,
                  h_rowmajor: bool):
    """backward_packed's math over the v4 SPLIT inputs. Emits TWO
    outputs: d_h in the SAME layout as the h input (row-major needs no
    XLA transpose afterwards — it feeds the sorted scatter directly) and
    d_meta (KM, E_cols) edge-major with rows [d_logits | d_drop]."""
    i = pl.program_id(0)
    lo = (tile_off_ref[i] // eb) * eb
    hi = tile_off_ref[i + 1]
    nblocks = pl.cdiv(hi - lo, eb)

    exp_rows = jax.lax.broadcasted_iota(jnp.int32, (nh8, nhf8), 0)
    exp_cols = jax.lax.broadcasted_iota(jnp.int32, (nh8, nhf8), 1)
    expander = ((exp_cols // f == exp_rows)
                & (exp_rows < nh) & (exp_cols < nh * f)).astype(jnp.float32)

    d = denom_t[:]
    if normalize:
        inv_d = jnp.where(d > 0.0, 1.0 / (d + eps), 0.0)
        outg_h = jax.lax.dot_general(
            expander, out_t[:] * g_t[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        d_den = -outg_h * inv_d
    else:
        inv_d = jnp.ones_like(d)
        d_den = d

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

    def dh_slice(start):
        if h_rowmajor:
            return dh_hbm.at[pl.ds(start, eb), :]
        return dh_hbm.at[:, pl.ds(start, eb)]

    def dma_wh(slot, b):
        start = pl.multiple_of(lo + b * eb, eb)
        return pltpu.make_async_copy(dhbuf.at[slot], dh_slice(start),
                                     wsems.at[slot, 0])

    def dma_wm(slot, b):
        start = pl.multiple_of(lo + b * eb, eb)
        return pltpu.make_async_copy(dmbuf.at[slot],
                                     dmeta_hbm.at[:, pl.ds(start, eb)],
                                     wsems.at[slot, 1])

    @pl.when(nblocks > 0)
    def _():
        dma_h(0, 0).start()
        dma_m(0, 0).start()

    def body(b, _):
        slot = b % 2
        wslot = b % 2

        @pl.when(b + 1 < nblocks)
        def _():
            dma_h((b + 1) % 2, b + 1).start()
            dma_m((b + 1) % 2, b + 1).start()

        dma_h(slot, b).wait()
        dma_m(slot, b).wait()
        # pipelined writes (same scheme as _kernel_v5_bwd): wait only for
        # the slot's previous write; post-loop drain covers the rest
        @pl.when(b >= 2)
        def _():
            dma_wh(wslot, b - 2).wait()
            dma_wm(wslot, b - 2).wait()
        start = pl.multiple_of(lo + b * eb, eb)

        if h_rowmajor:
            h_t = hbuf[slot].T[:nhf8].astype(jnp.float32)   # (NHF8, EB)
        else:
            h_t = hbuf[slot].astype(jnp.float32)
        meta = mbuf[slot]
        ex_t = jnp.exp(meta[0:nh8, :])
        col = start + jax.lax.broadcasted_iota(jnp.int32, (1, eb), 1)
        ex_t = jnp.where(col < e_real, ex_t, 0.0)
        recv_at = nh8 + (nh8 if with_dropout else 0)
        recv_row = meta[recv_at:recv_at + 1, :]
        rows = (i * nb
                + jax.lax.broadcasted_iota(jnp.int32, (nb, eb), 0)
                ).astype(jnp.float32)
        onehot_t = (recv_row == rows).astype(jnp.float32)

        payload = jnp.concatenate([g_t[:], inv_d, d_den], axis=0)
        payload_e = jax.lax.dot_general(
            payload, onehot_t, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        g_e = payload_e[0:nhf8, :]
        invd_e = payload_e[nhf8:nhf8 + nh8, :]
        dden_e = payload_e[nhf8 + nh8:nhf8 + 2 * nh8, :]

        m = meta[nh8:2 * nh8, :] if with_dropout else None

        coef = ex_t * invd_e if m is None else ex_t * m * invd_e
        coef_wide = jax.lax.dot_general(
            expander, coef, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        d_h = coef_wide * g_e                               # (NHF8, EB)

        hdotg = jax.lax.dot_general(
            expander, h_t * g_e, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        d_ex = hdotg * invd_e
        if m is not None:
            d_ex = d_ex * m
        d_logits = ex_t * (d_ex + dden_e)

        mparts = [d_logits]
        if with_dropout:
            mparts.append(hdotg * ex_t * invd_e)
        dmblk = jnp.concatenate(mparts, axis=0)
        dmblk = jnp.pad(dmblk, ((0, km - dmblk.shape[0]), (0, 0)))
        if h_rowmajor:
            dhblk = jnp.pad(d_h, ((0, nhfl - nhf8), (0, 0))).T
        else:
            dhblk = d_h

        # first (aligned-down) block may contain the previous tile's
        # edges: accumulate against what is already there
        @pl.when(b == 0)
        def _():
            rh = pltpu.make_async_copy(dh_slice(start), rhbuf,
                                       rsems.at[0])
            rm = pltpu.make_async_copy(dmeta_hbm.at[:, pl.ds(start, eb)],
                                       rmbuf, rsems.at[1])
            rh.start()
            rm.start()
            rh.wait()
            rm.wait()
            dhbuf[wslot] = dhblk + rhbuf[:]
            dmbuf[wslot] = dmblk + rmbuf[:]

        @pl.when(b > 0)
        def _():
            dhbuf[wslot] = dhblk
            dmbuf[wslot] = dmblk

        dma_wh(wslot, b).start()
        dma_wm(wslot, b).start()
        return 0

    jax.lax.fori_loop(0, nblocks, body, 0)

    @pl.when(nblocks >= 2)
    def _():
        dma_wh((nblocks - 2) % 2, nblocks - 2).wait()
        dma_wm((nblocks - 2) % 2, nblocks - 2).wait()

    @pl.when(nblocks >= 1)
    def _():
        dma_wh((nblocks - 1) % 2, nblocks - 1).wait()
        dma_wm((nblocks - 1) % 2, nblocks - 1).wait()


def backward_split(h_src: jax.Array,          # (NHF8, E+EB) edge-major or
                   #                            (E+EB, NHF8) row-major
                   meta: jax.Array,           # (MR, E+EB) logits|drop|recv
                   receivers: jax.Array,      # (E,) int32 dst-sorted
                   g: jax.Array,              # (N, NH*F) upstream cotangent
                   out: jax.Array,            # (N, NH*F) forward output
                   denom: jax.Array,          # (N, NH) forward denominators
                   num_nodes: int, nh: int, f: int,
                   *, eps: float, eb: int, nb: int,
                   with_dropout: bool, interpret: bool,
                   normalize: bool = True, vma: tuple = (),
                   h_rowmajor: bool = False):
    """Split-input twin of backward_packed. Returns (d_h, d_meta):
    d_h in h_src's layout (row-major feeds the sorted scatter without an
    XLA transpose); d_meta (KM, E+EB) edge-major rows
    [d_logits NH8 (| d_drop NH8)]."""
    e = receivers.shape[0]
    t = pl.cdiv(num_nodes, nb)
    n_pad = t * nb
    nh8 = _round_up(nh, 8)
    nhf8 = _round_up(nh * f, 8)
    km = nh8 + (nh8 if with_dropout else 0)
    e_cols = meta.shape[1]
    nhfl = h_src.shape[1] if h_rowmajor else nhf8

    def node_t(a, rows):
        a_t = a.T
        return jnp.pad(a_t, ((0, rows - a_t.shape[0]),
                             (0, n_pad - a_t.shape[1])))

    g_t = node_t(g, nhf8)
    out_t = node_t(out, nhf8)
    denom_t = node_t(denom, nh8)

    bounds = jnp.arange(t + 1, dtype=jnp.int32) * nb
    tile_off = jnp.searchsorted(receivers, bounds, side="left"
                                ).astype(jnp.int32)
    dh_shape = ((e_cols, nhfl) if h_rowmajor else (nhf8, e_cols))
    zeros_h = jnp.zeros(dh_shape, jnp.float32)
    zeros_m = jnp.zeros((km, e_cols), jnp.float32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(t,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),   # h_src
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),   # meta
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),   # zeros_h
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),   # zeros_m
            pl.BlockSpec((nhf8, nb), lambda i, *_: (0, i),
                         memory_space=pltpu.VMEM),              # g_t
            pl.BlockSpec((nhf8, nb), lambda i, *_: (0, i),
                         memory_space=pltpu.VMEM),              # out_t
            pl.BlockSpec((nh8, nb), lambda i, *_: (0, i),
                         memory_space=pltpu.VMEM),              # denom_t
        ],
        out_specs=(pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
                   pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM)),
        scratch_shapes=[
            pltpu.VMEM((2, eb, nhfl) if h_rowmajor else (2, nhf8, eb),
                       h_src.dtype),
            pltpu.VMEM((2, meta.shape[0], eb), jnp.float32),
            pltpu.VMEM((2, eb, nhfl) if h_rowmajor else (2, nhf8, eb),
                       jnp.float32),
            pltpu.VMEM((2, km, eb), jnp.float32),
            pltpu.VMEM((eb, nhfl) if h_rowmajor else (nhf8, eb),
                       jnp.float32),
            pltpu.VMEM((km, eb), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 2)),
            pltpu.SemaphoreType.DMA((2, 2)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    kernel = functools.partial(
        _kernel_split, eb=eb, nb=nb, nh=nh, f=f, nh8=nh8, nhf8=nhf8,
        nhfl=nhfl, km=km, e_real=e, eps=eps, with_dropout=with_dropout,
        normalize=normalize, h_rowmajor=h_rowmajor)
    sds_kw = {"vma": frozenset(vma)} if vma else {}
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(jax.ShapeDtypeStruct(dh_shape, jnp.float32, **sds_kw),
                   jax.ShapeDtypeStruct((km, e_cols), jnp.float32,
                                        **sds_kw)),
        input_output_aliases={3: 0, 4: 1},  # zeros -> outputs (post-prefetch)
        cost_estimate=pl.CostEstimate(
            flops=2 * 3 * (e + eb) * nb * (nhf8 + nh8),
            bytes_accessed=(e + eb) * (2 * nhf8 + meta.shape[0]
                                       + 2 * km) * 4
            + n_pad * (2 * nhf8 + nh8) * 4,
            transcendentals=(e + eb) * nh8),
        interpret=interpret,
    )(tile_off, h_src, meta, zeros_h, zeros_m, g_t, out_t, denom_t)


def backward_packed(packed: jax.Array,        # (R, E+EB) from forward
                    receivers: jax.Array,     # (E,) int32 dst-sorted
                    g: jax.Array,             # (N, NH*F) upstream cotangent
                    out: jax.Array,           # (N, NH*F) forward output
                    denom: jax.Array,         # (N, NH) forward denominators
                    num_nodes: int, nh: int, f: int,
                    *, eps: float, eb: int, nb: int,
                    with_dropout: bool, interpret: bool,
                    normalize: bool = True, vma: tuple = ()):
    """Returns d_packed (KO, E+EB): rows [d_h (NHF8) | d_logits (NH8)
    (| d_drop NH8)] edge-major; slice+transpose at the caller.

    normalize=False computes the partial/unnormalised op's VJP: pass the
    cotangents as g := g_num and denom := g_denom (out is ignored)."""
    e = receivers.shape[0]
    t = pl.cdiv(num_nodes, nb)
    n_pad = t * nb
    nh8 = _round_up(nh, 8)
    nhf8 = _round_up(nh * f, 8)
    ko = nhf8 + nh8 + (nh8 if with_dropout else 0)
    r = packed.shape[0]

    def node_t(a, rows):
        a_t = a.T
        return jnp.pad(a_t, ((0, rows - a_t.shape[0]),
                             (0, n_pad - a_t.shape[1])))

    g_t = node_t(g, nhf8)
    out_t = node_t(out, nhf8)
    denom_t = node_t(denom, nh8)

    bounds = jnp.arange(t + 1, dtype=jnp.int32) * nb
    tile_off = jnp.searchsorted(receivers, bounds, side="left"
                                ).astype(jnp.int32)
    zeros = jnp.zeros((ko, packed.shape[1]), jnp.float32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(t,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),   # packed
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),   # zeros
            pl.BlockSpec((nhf8, nb), lambda i, *_: (0, i),
                         memory_space=pltpu.VMEM),              # g_t
            pl.BlockSpec((nhf8, nb), lambda i, *_: (0, i),
                         memory_space=pltpu.VMEM),              # out_t
            pl.BlockSpec((nh8, nb), lambda i, *_: (0, i),
                         memory_space=pltpu.VMEM),              # denom_t
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
        scratch_shapes=[
            pltpu.VMEM((2, r, eb), jnp.float32),     # packed blocks
            pltpu.VMEM((2, ko, eb), jnp.float32),    # outgoing d blocks
            pltpu.VMEM((ko, eb), jnp.float32),       # read-back buffer
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    kernel = functools.partial(
        _kernel, eb=eb, nb=nb, nh=nh, f=f, nh8=nh8, nhf8=nhf8, ko=ko,
        e_real=e, eps=eps, with_dropout=with_dropout, normalize=normalize)
    sds_kw = {"vma": frozenset(vma)} if vma else {}
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((ko, packed.shape[1]), jnp.float32,
                                       **sds_kw),
        input_output_aliases={2: 0},   # zeros -> output (after prefetch)
        cost_estimate=pl.CostEstimate(
            flops=2 * 3 * (e + eb) * nb * (nhf8 + nh8),
            bytes_accessed=(e + eb) * (r + 2 * ko) * 4
            + n_pad * (2 * nhf8 + nh8) * 4,
            transcendentals=(e + eb) * nh8),
        interpret=interpret,
    )(tile_off, packed, zeros, g_t, out_t, denom_t)


# --------------------------------------------------------------------------
# v5 backward: logits recomputed in-kernel (segment_attention._kernel_v5),
# quotient rule + leaky'/cap chain applied on-chip. Emits d(h) row-major,
# d(dropout) edge-major, d(s_dst) as per-tile node reductions, and
# d(a_src)/d(cap) as grid-accumulated VMEM outputs — NO narrow (E, NH)
# array ever reaches XLA.
# --------------------------------------------------------------------------

def _kernel_v5_bwd(pref_ref,
                   h_hbm,          # (E_cols, NHFL) row-major
                   meta_hbm,       # (MR, E_cols): [drop?] recv
                   zeros_h_hbm, zeros_m_hbm,
                   g_t, out_t, denom_t,     # (nhf8|nh8, NB) per tile
                   s_dst_ref,               # (NH8, NB) per tile
                   a_src_ref,               # (NHFL, NH8) whole
                   cap_ref,                 # (1, 1) SMEM
                   dh_hbm, dmeta_hbm,       # aliased outputs
                   dsdst_ref,               # (NH8, NB) VMEM out per tile
                   dasrc_ref,               # (NHFL, NH8) VMEM grid-acc
                   dcap_ref,                # (8, 128) VMEM grid-acc
                   hbuf, mbuf, dhbuf, dmbuf, rhbuf, rmbuf,
                   sems, wsems, rsems,
                   *, eb: int, nb: int, nh: int, f: int, nh8: int,
                   nhf8: int, nhfl: int, eps: float, slope: float,
                   with_dropout: bool, sweep1: bool = False,
                   normalize: bool = True):
    # sweep1 (v10 single-sweep forward): cap_ref holds eps' =
    # eps*exp(slope*cap'), denom is the UNNORMALISED den', the raw
    # scores are B-shifted, and LeakyReLU is its negative branch
    # everywhere (segment_attention._kernel_v5_auto docstring); the cap
    # cotangent moves to the XLA epilogue (d_cap output unused).
    # normalize=False (implies sweep1): the op's outputs are the raw
    # (num, den) parts and the caller's epilogue is differentiated in
    # XLA — g_t carries d_num, denom_t carries d_den, out_t is unused,
    # and the quotient terms collapse to inv_d = 1 (same convention as
    # the older partial kernels above).
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

    a_src_t = a_src_ref[:].astype(jnp.float32)              # (NHFL, NH8)
    cap = cap_ref[0, 0]
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
    dsdst_ref[:] = jnp.zeros_like(dsdst_ref)

    @pl.when(i == 0)
    def _():
        dasrc_ref[:] = jnp.zeros_like(dasrc_ref)
        dcap_ref[:] = jnp.zeros_like(dcap_ref)

    def dma_h(slot, b):
        start = pl.multiple_of(lo + b * eb, eb)
        return pltpu.make_async_copy(h_hbm.at[pl.ds(start, eb), :],
                                     hbuf.at[slot], sems.at[slot, 0])

    def dma_m(slot, b):
        start = pl.multiple_of(lo + b * eb, eb)
        return pltpu.make_async_copy(meta_hbm.at[:, pl.ds(start, eb)],
                                     mbuf.at[slot], sems.at[slot, 1])

    def dma_wh(slot, b):
        start = pl.multiple_of(lo + b * eb, eb)
        return pltpu.make_async_copy(dhbuf.at[slot],
                                     dh_hbm.at[pl.ds(start, eb), :],
                                     wsems.at[slot, 0])

    def dma_wm(slot, b):
        start = pl.multiple_of(lo + b * eb, eb)
        return pltpu.make_async_copy(dmbuf.at[slot],
                                     dmeta_hbm.at[:, pl.ds(start, eb)],
                                     wsems.at[slot, 1])

    @pl.when(nblocks > 0)
    def _():
        dma_h(0, 0).start()
        dma_m(0, 0).start()

    def body(b, _):
        slot = b % 2
        wslot = b % 2

        @pl.when(b + 1 < nblocks)
        def _():
            dma_h((b + 1) % 2, b + 1).start()
            dma_m((b + 1) % 2, b + 1).start()

        dma_h(slot, b).wait()
        dma_m(slot, b).wait()
        # write DMAs are pipelined: only wait for the write issued two
        # blocks ago before reusing its buffer slot (blocks within a
        # tile target disjoint [start, start+eb) ranges, so in-flight
        # writes never alias; the cross-TILE overlap from aligning `lo`
        # down is safe because all writes drain before the grid step
        # ends — see the post-loop waits)
        @pl.when(b >= 2)
        def _():
            dma_wh(wslot, b - 2).wait()
            dma_wm(wslot, b - 2).wait()
        start = pl.multiple_of(lo + b * eb, eb)

        hb = hbuf[slot].astype(jnp.float32)                 # (EB, NHFL)
        h_full_t = hb.T
        h_t = h_full_t[:nhf8]
        meta = mbuf[slot]
        recv_at = nh8 if with_dropout else 0
        recv_row = meta[recv_at:recv_at + 1, :]
        rows = (i * nb
                + jax.lax.broadcasted_iota(jnp.int32, (nb, eb), 0)
                ).astype(jnp.float32)
        onehot_t = (recv_row == rows).astype(jnp.float32)   # (NB, EB)

        # recompute forward logits/ex on-chip
        s_src = jax.lax.dot_general(
            a_src_t, hb, (((0,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        s_dst_e = jax.lax.dot_general(
            s_dst_ref[:], onehot_t, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        raw = s_src + s_dst_e
        pre = raw if sweep1 else raw - cap
        lgt = slope * pre if sweep1 else jnp.where(
            pre > 0.0, pre, slope * pre)
        ex = jnp.exp(lgt)
        col = start + jax.lax.broadcasted_iota(jnp.int32, (1, eb), 1)
        in_range = col < e_real
        ex = jnp.where(in_range, ex, 0.0)

        payload = jnp.concatenate([g_t[:], inv_d, d_den], axis=0)
        payload_e = jax.lax.dot_general(
            payload, onehot_t, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        g_e = payload_e[0:nhf8, :]
        invd_e = payload_e[nhf8:nhf8 + nh8, :]
        dden_e = payload_e[nhf8 + nh8:nhf8 + 2 * nh8, :]

        m = meta[0:nh8, :] if with_dropout else None

        coef = ex * invd_e if m is None else ex * m * invd_e
        coef_wide = jax.lax.dot_general(
            expander, coef, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        d_h_feat = coef_wide * g_e                          # (NHF8, EB)

        hdotg = jax.lax.dot_general(
            expander, h_t * g_e, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        d_ex = hdotg * invd_e
        if m is not None:
            d_ex = d_ex * m
        d_lg = ex * (d_ex + dden_e)
        d_pre = slope * d_lg if sweep1 else jnp.where(
            pre > 0.0, d_lg, slope * d_lg)
        d_raw = jnp.where(in_range, d_pre, 0.0)             # (NH8, EB)

        # d(h) = feature term + attention term a_src . d_raw
        d_h_att = jax.lax.dot_general(
            a_src_t, d_raw, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)             # (NHFL, EB)
        if nhf8 == nhfl:
            # no lane padding (nhf already a 128-multiple): the [nhf8:]
            # tail would be a zero-row slice, which Mosaic rejects
            # ("vector types must have positive constant sizes")
            d_h_full = d_h_att + d_h_feat
        else:
            d_h_full = jnp.concatenate(
                [d_h_att[:nhf8] + d_h_feat, d_h_att[nhf8:]], axis=0)
        dhblk = d_h_full.T                                  # (EB, NHFL)

        dsdst_ref[:] += jax.lax.dot_general(
            d_raw, onehot_t, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)             # (NH8, NB)
        dasrc_ref[:] += jax.lax.dot_general(
            h_full_t, d_raw, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)             # (NHFL, NH8)
        # scalar accumulate via a full-block masked add (Mosaic rejects
        # scalar stores to VMEM; interpret mode tolerates them)
        if not sweep1:   # sweep1: d(cap) is closed-form in XLA instead
            slot00 = ((jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
                       == 0)
                      & (jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
                         == 0))
            dcap_ref[:] += jnp.where(slot00, -jnp.sum(d_raw), 0.0)

        dmblk = hdotg * ex * invd_e                         # d_drop (NH8,EB)

        @pl.when(b == 0)
        def _():
            rh = pltpu.make_async_copy(dh_hbm.at[pl.ds(start, eb), :],
                                       rhbuf, rsems.at[0])
            rm = pltpu.make_async_copy(dmeta_hbm.at[:, pl.ds(start, eb)],
                                       rmbuf, rsems.at[1])
            rh.start()
            rm.start()
            rh.wait()
            rm.wait()
            dhbuf[wslot] = dhblk + rhbuf[:]
            dmbuf[wslot] = dmblk + rmbuf[:]

        @pl.when(b > 0)
        def _():
            dhbuf[wslot] = dhblk
            dmbuf[wslot] = dmblk

        dma_wh(wslot, b).start()
        dma_wm(wslot, b).start()
        return 0

    jax.lax.fori_loop(0, nblocks, body, 0)

    # drain the (up to two) still-in-flight write DMAs before this grid
    # step ends: the next tile's b==0 read-modify-write reads the edge
    # block that `lo`-alignment makes both tiles share
    @pl.when(nblocks >= 2)
    def _():
        dma_wh((nblocks - 2) % 2, nblocks - 2).wait()
        dma_wm((nblocks - 2) % 2, nblocks - 2).wait()

    @pl.when(nblocks >= 1)
    def _():
        dma_wh((nblocks - 1) % 2, nblocks - 1).wait()
        dma_wm((nblocks - 1) % 2, nblocks - 1).wait()


def backward_v5(h_src, meta, a_pad, s_dst, cap, receivers, e_real,
                g, out, denom, num_nodes: int, nh: int, f: int,
                *, eps: float, slope: float, eb: int, nb: int,
                with_dropout: bool, interpret: bool,
                sweep1: bool = False, normalize: bool = True):
    """Returns (d_h rows (E_cols, NHFL), d_drop (NH8, E_cols),
    d_sdst_t (NH8, N_pad), d_apad (NHFL, NH8), d_cap (8, 128)).
    sweep1: `cap` holds eps' and `denom` the unnormalised den'
    (v10 single-sweep forward — _kernel_v5_bwd docstring).
    normalize=False: `g` carries d_num, `denom` carries d_den, `out`
    is ignored (the parts-op VJP — _kernel_v5_bwd docstring)."""
    e = receivers.shape[0]
    t = pl.cdiv(num_nodes, nb)
    n_pad = t * nb
    nh8 = _round_up(nh, 8)
    nhf8 = _round_up(nh * f, 8)
    nhfl = h_src.shape[1]
    e_cols = h_src.shape[0]

    def node_t(a, rows):
        a_t = a.T
        return jnp.pad(a_t, ((0, rows - a_t.shape[0]),
                             (0, n_pad - a_t.shape[1])))

    g_t = node_t(g, nhf8)
    out_t = node_t(out, nhf8)
    denom_t = node_t(denom, nh8)
    s_dst_t = node_t(s_dst, nh8)

    bounds = jnp.arange(t + 1, dtype=jnp.int32) * nb
    tile_off = jnp.searchsorted(receivers, bounds, side="left"
                                ).astype(jnp.int32)
    pref = jnp.concatenate([tile_off, e_real[None].astype(jnp.int32)])
    zeros_h = jnp.zeros((e_cols, nhfl), jnp.float32)
    zeros_m = jnp.zeros((nh8, e_cols), jnp.float32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(t,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),   # h_src
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
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),   # d_h
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),   # d_drop
            pl.BlockSpec((nh8, nb), lambda i, *_: (0, i),
                         memory_space=pltpu.VMEM),              # d_sdst
            pl.BlockSpec((nhfl, nh8), lambda i, *_: (0, 0),
                         memory_space=pltpu.VMEM),              # d_asrc
            pl.BlockSpec((8, 128), lambda i, *_: (0, 0),
                         memory_space=pltpu.VMEM),              # d_cap
        ),
        scratch_shapes=[
            pltpu.VMEM((2, eb, nhfl), h_src.dtype),
            pltpu.VMEM((2, meta.shape[0], eb), jnp.float32),
            pltpu.VMEM((2, eb, nhfl), jnp.float32),
            pltpu.VMEM((2, nh8, eb), jnp.float32),
            pltpu.VMEM((eb, nhfl), jnp.float32),
            pltpu.VMEM((nh8, eb), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 2)),
            pltpu.SemaphoreType.DMA((2, 2)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    kernel = functools.partial(
        _kernel_v5_bwd, eb=eb, nb=nb, nh=nh, f=f, nh8=nh8, nhf8=nhf8,
        nhfl=nhfl, eps=eps, slope=slope, with_dropout=with_dropout,
        sweep1=sweep1, normalize=normalize)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((e_cols, nhfl), jnp.float32),
            jax.ShapeDtypeStruct((nh8, e_cols), jnp.float32),
            jax.ShapeDtypeStruct((nh8, n_pad), jnp.float32),
            jax.ShapeDtypeStruct((nhfl, nh8), jnp.float32),
            jax.ShapeDtypeStruct((8, 128), jnp.float32),
        ),
        input_output_aliases={3: 0, 4: 1},
        cost_estimate=pl.CostEstimate(
            flops=2 * 5 * (e + eb) * nb * (nhf8 + nh8),
            bytes_accessed=(e + eb) * (2 * nhfl + meta.shape[0]
                                       + nh8) * 4
            + n_pad * (2 * nhf8 + 2 * nh8) * 4,
            transcendentals=(e + eb) * nh8),
        interpret=interpret,
    )(pref, h_src, meta, zeros_h, zeros_m, g_t, out_t, denom_t,
      s_dst_t, a_pad, cap.reshape(1, 1))
