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


def _round_up(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


def _kernel(tile_off_ref,          # scalar prefetch: (T+1,) int32
            logits_hbm, h_hbm, recv_hbm, drop_hbm,   # HBM, edge-major lanes
            out_ref, denom_ref,    # VMEM outputs, blocked per node tile
            logits_buf, h_buf, recv_buf, drop_buf, sems,
            *, eb: int, nb: int, nh: int, f: int, nh8: int, nhf8: int,
            eps: float, with_dropout: bool):
    """All edge arrays are TRANSPOSED — the edge axis is the lane (minor)
    dimension: logits (NH8, E), h (NHF8, E), recv (8, E). Every DMA slice
    is then [full-sublanes, EB lanes] with EB a multiple of 128 and the
    sublane counts padded to multiples of 8 — the f32 (8, 128) tile is
    the only granularity Mosaic slices at (an (EB, NH) layout would need
    sub-128 lane slices; NH*F=7 would need sub-8 sublane slices).
    Padding head/feature rows carry -inf logits (exp = 0) or zeros, so
    they contribute nothing. Outputs transposed too: (NHF8, N)/(NH8, N).
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

    out_ref[:] = jnp.zeros_like(out_ref)
    denom_ref[:] = jnp.zeros_like(denom_ref)

    nbuf = 2  # double buffer

    def dma(slot, b):
        start = pl.multiple_of(lo + b * eb, eb)
        cps = [
            pltpu.make_async_copy(logits_hbm.at[:, pl.ds(start, eb)],
                                  logits_buf.at[slot], sems.at[slot, 0]),
            pltpu.make_async_copy(h_hbm.at[:, pl.ds(start, eb)],
                                  h_buf.at[slot], sems.at[slot, 1]),
            pltpu.make_async_copy(recv_hbm.at[:, pl.ds(start, eb)],
                                  recv_buf.at[slot], sems.at[slot, 2]),
        ]
        if with_dropout:
            cps.append(
                pltpu.make_async_copy(drop_hbm.at[:, pl.ds(start, eb)],
                                      drop_buf.at[slot], sems.at[slot, 3]))
        return cps

    @pl.when(nblocks > 0)
    def _():
        for cp in dma(0, 0):
            cp.start()

    def body(b, _):
        slot = b % nbuf

        @pl.when(b + 1 < nblocks)
        def _():
            for cp in dma((b + 1) % nbuf, b + 1):
                cp.start()

        for cp in dma(slot, b):
            cp.wait()

        ex_t = jnp.exp(logits_buf[slot])                    # (NH8, EB)
        # one-hot^T of receiver vs this tile's node range; edges whose
        # receiver is outside the tile (block overrun) vanish here.
        # recv is padded to 8 sublanes; only row 0 is meaningful.
        recv_row = recv_buf[slot][0:1, :]                   # (1, EB)
        rows = i * nb + jax.lax.broadcasted_iota(jnp.int32, (nb, eb), 0)
        onehot_t = (recv_row == rows).astype(jnp.float32)   # (NB, EB)

        sum_eb_rhs = (((1,), (1,)), ((), ()))   # contract the edge axis
        denom_ref[:] += jax.lax.dot_general(
            ex_t, onehot_t, sum_eb_rhs,
            preferred_element_type=jnp.float32)             # (NH8, NB)

        num_t = ex_t
        if with_dropout:
            num_t = num_t * drop_buf[slot]
        num_wide = jax.lax.dot_general(
            expander, num_t, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)             # (NHF8, EB)
        weighted_t = h_buf[slot] * num_wide
        out_ref[:] += jax.lax.dot_general(
            weighted_t, onehot_t, sum_eb_rhs,
            preferred_element_type=jnp.float32)             # (NHF8, NB)
        return 0

    jax.lax.fori_loop(0, nblocks, body, 0)

    # empty segments (padding nodes, eps=0 faithful mode) -> 0, not 0*inf
    d = denom_ref[:]                                        # (NH8, NB)
    inv = jnp.where(d > 0.0, 1.0 / (d + eps), 0.0)
    inv_wide = jax.lax.dot_general(
        expander, inv, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)                 # (NHF8, NB)
    out_ref[:] = out_ref[:] * inv_wide


def _forward(logits: jax.Array,       # (E, NH) post-LeakyReLU/cap; pad=-inf
             h_src: jax.Array,        # (E, NH*F) gathered source features
             receivers: jax.Array,    # (E,) int32, dst-sorted
             drop_mask: Optional[jax.Array],  # (E, NH) prescaled keep mask
             num_nodes: int, nh: int, f: int,
             *, eps: float, eb: int, nb: int, interpret: bool):
    e = logits.shape[0]
    t = pl.cdiv(num_nodes, nb)
    n_pad = t * nb
    nh8 = _round_up(nh, 8)
    nhf8 = _round_up(nh * f, 8)

    # transpose to edge-major lanes; pad the edge axis by EB so the last
    # block's overrun read stays in-bounds, and the sublane axes to
    # multiples of 8 (f32 tile granularity — see _kernel docstring)
    def pad_t(a_t, rows, fill):
        return jnp.pad(a_t, ((0, rows - a_t.shape[0]), (0, eb)),
                       constant_values=fill)

    logits_p = pad_t(logits.T, nh8, NEG_INF)                 # (NH8, E+EB)
    h_p = pad_t(h_src.T, nhf8, 0.0)                          # (NHF8, E+EB)
    recv_p = pad_t(receivers.astype(jnp.int32)[None, :], 8, num_nodes)
    with_dropout = drop_mask is not None
    drop_p = pad_t(drop_mask.T, nh8, 0.0) if with_dropout else \
        jnp.zeros((nh8, 1), jnp.float32)

    # per-tile contiguous edge ranges (receivers ascending)
    bounds = jnp.arange(t + 1, dtype=jnp.int32) * nb
    tile_off = jnp.searchsorted(receivers, bounds, side="left"
                                ).astype(jnp.int32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(t,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),  # logits^T
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),  # h_src^T
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),  # receivers
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),  # drop mask^T
        ],
        out_specs=[
            pl.BlockSpec((nhf8, nb), lambda i, *_: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nh8, nb), lambda i, *_: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, nh8, eb), jnp.float32),
            pltpu.VMEM((2, nhf8, eb), jnp.float32),
            pltpu.VMEM((2, 8, eb), jnp.int32),
            pltpu.VMEM((2, nh8, eb), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 4)),
        ],
    )

    kernel = functools.partial(_kernel, eb=eb, nb=nb, nh=nh, f=f,
                               nh8=nh8, nhf8=nhf8, eps=eps,
                               with_dropout=with_dropout)
    flops_est = 2 * 2 * (e + eb) * nb * (nhf8 + nh8)
    out_t, denom_t = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((nhf8, n_pad), jnp.float32),
            jax.ShapeDtypeStruct((nh8, n_pad), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=flops_est,
            bytes_accessed=(e + eb) * (nhf8 + 2 * nh8 + 8) * 4
            + n_pad * (nhf8 + nh8) * 4,
            transcendentals=(e + eb) * nh8),
        interpret=interpret,
    )(tile_off, logits_p, h_p, recv_p, drop_p)
    return (out_t.T[:num_nodes, :nh * f],
            denom_t.T[:num_nodes, :nh])


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


def _fsa_fwd(logits, h_src, receivers, drop_mask,
             num_nodes, nh, f, eps, eb, nb, interpret):
    out, denom = _forward(logits, h_src, receivers, drop_mask, num_nodes,
                          nh, f, eps=eps, eb=eb, nb=nb, interpret=interpret)
    return out, (logits, h_src, receivers, drop_mask, denom, out)


def _fsa_bwd(num_nodes, nh, f, eps, eb, nb, interpret, res, g):
    """Quotient rule on saved denominators (exact, plain XLA):
        out[n] = num[n] / D[n],  D[n] = denom[n] + eps
        d h_e    = m_e ex_e / D[r_e] * g[r_e]            (per head)
        d ex_e   = m_e (h_e . g[r_e]) / D[r_e]
        d denom  = -(out . g) / D        (per node, head)
        d logit_e = ex_e * (d ex_e + d denom[r_e])
    """
    logits, h_src, receivers, drop_mask, denom, out = res
    e = logits.shape[0]
    g = g.reshape(num_nodes, nh, f)
    out3 = out.reshape(num_nodes, nh, f)
    h3 = h_src.reshape(e, nh, f)
    # empty segments carry no gradient; avoid 0 * inf = NaN when eps = 0
    big_d = jnp.where(denom > 0.0, denom + eps, 1.0)        # (N, NH)

    ex = jnp.exp(logits)                                    # (E, NH)
    m = drop_mask if drop_mask is not None else None

    g_e = jnp.take(g, receivers, axis=0)                    # (E, NH, F)
    inv_d_e = 1.0 / jnp.take(big_d, receivers, axis=0)      # (E, NH)

    coef = ex * inv_d_e if m is None else ex * m * inv_d_e
    d_h = (coef[:, :, None] * g_e).reshape(e, nh * f)

    d_ex_num = jnp.sum(h3 * g_e, axis=-1) * inv_d_e         # (E, NH)
    if m is not None:
        d_ex_num = d_ex_num * m
    d_denom = -jnp.sum(out3 * g, axis=-1) / big_d           # (N, NH)
    d_logits = ex * (d_ex_num + jnp.take(d_denom, receivers, axis=0))

    d_drop = None
    if m is not None:
        d_drop = jnp.sum(h3 * g_e, axis=-1) * ex * inv_d_e
    return d_logits, d_h, None, d_drop


fused_segment_attention.defvjp(_fsa_fwd, _fsa_bwd)


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
