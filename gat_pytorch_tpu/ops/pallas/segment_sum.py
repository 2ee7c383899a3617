"""Generic sorted segment-sum Pallas kernel.

out[s] = sum over rows with ids[e] == s of values[e, :], ids sorted
ascending — the standalone TPU-native `scatter_add_` replacement
(reference models/utils.py:6-27) for callers outside the fused GAT path:
the gather-transpose in the attention backward (d h_flat accumulated
over src-sorted edges), degree counting, and any segment reduction over
a sorted index.

Same design as segment_attention._kernel: per segment-tile contiguous
row ranges via scalar prefetch, packed edge-major lanes (values rows +
ids row) in one DMA per block, compare-and-matmul one-hot reduction on
the MXU. Measured against jax.ops.segment_sum in tests (interpret mode).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


def _kernel(tile_off_ref, packed_hbm, acc_ref, buf, sems,
            *, eb: int, nb: int, d8: int):
    i = pl.program_id(0)
    lo = (tile_off_ref[i] // eb) * eb
    hi = tile_off_ref[i + 1]
    nblocks = pl.cdiv(hi - lo, eb)
    acc_ref[:] = jnp.zeros_like(acc_ref)

    def dma(slot, b):
        start = pl.multiple_of(lo + b * eb, eb)
        return pltpu.make_async_copy(packed_hbm.at[:, pl.ds(start, eb)],
                                     buf.at[slot], sems.at[slot])

    @pl.when(nblocks > 0)
    def _():
        dma(0, 0).start()

    def body(b, _):
        slot = b % 2

        @pl.when(b + 1 < nblocks)
        def _():
            dma((b + 1) % 2, b + 1).start()

        dma(slot, b).wait()
        block = buf[slot]                                   # (D8+8, EB)
        vals = block[0:d8, :]
        id_row = block[d8:d8 + 1, :]                        # (1, EB)
        rows = (i * nb
                + jax.lax.broadcasted_iota(jnp.int32, (nb, eb), 0)
                ).astype(jnp.float32)
        onehot_t = (id_row == rows).astype(jnp.float32)     # (NB, EB)
        acc_ref[:] += jax.lax.dot_general(
            vals, onehot_t, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)             # (D8, NB)
        return 0

    jax.lax.fori_loop(0, nblocks, body, 0)


def _kernel_rows(tile_off_ref, vals_hbm, ids_hbm, acc_ref, vbuf, ibuf,
                 sems, *, eb: int, nb: int, d8: int, dl: int):
    """Row-major variant: vals_hbm (E_rows, DL>=128 lanes) is DMA-sliced
    on sublanes and transposed on-chip — an XLA transpose feeding a
    pallas operand materialises catastrophically (PERF.md r2)."""
    i = pl.program_id(0)
    lo = (tile_off_ref[i] // eb) * eb
    hi = tile_off_ref[i + 1]
    nblocks = pl.cdiv(hi - lo, eb)
    acc_ref[:] = jnp.zeros_like(acc_ref)

    def dma_v(slot, b):
        start = pl.multiple_of(lo + b * eb, eb)
        return pltpu.make_async_copy(vals_hbm.at[pl.ds(start, eb), :],
                                     vbuf.at[slot], sems.at[slot, 0])

    def dma_i(slot, b):
        start = pl.multiple_of(lo + b * eb, eb)
        return pltpu.make_async_copy(ids_hbm.at[:, pl.ds(start, eb)],
                                     ibuf.at[slot], sems.at[slot, 1])

    @pl.when(nblocks > 0)
    def _():
        dma_v(0, 0).start()
        dma_i(0, 0).start()

    def body(b, _):
        slot = b % 2

        @pl.when(b + 1 < nblocks)
        def _():
            dma_v((b + 1) % 2, b + 1).start()
            dma_i((b + 1) % 2, b + 1).start()

        dma_v(slot, b).wait()
        dma_i(slot, b).wait()
        vals = vbuf[slot].T[:d8]                            # (D8, EB)
        id_row = ibuf[slot][0:1, :]                         # (1, EB)
        rows = (i * nb
                + jax.lax.broadcasted_iota(jnp.int32, (nb, eb), 0)
                ).astype(jnp.float32)
        onehot_t = (id_row == rows).astype(jnp.float32)     # (NB, EB)
        acc_ref[:] += jax.lax.dot_general(
            vals, onehot_t, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)             # (D8, NB)
        return 0

    jax.lax.fori_loop(0, nblocks, body, 0)


def _kernel_rows_nt(tile_off_ref, vals_hbm, ids_hbm, acc_ref, vbuf, ibuf,
                    sems, *, eb: int, nb: int, dl: int,
                    dot_dtype=None):
    """No-transpose row-major variant: contracts the one-hot's LANE axis
    against the value block's SUBLANE axis — the 'mixed' MXU form the
    round-2 sweep measured 2x slower per MAC — but skips the per-block
    (EB, DL) on-chip transpose AND the final XLA (DL, N_pad) transpose
    entirely (the accumulator is (NB, DL) row-major, which is d_table's
    layout). Which effect wins is workload-dependent: probe_bwd_path
    measures both on the scale shapes."""
    i = pl.program_id(0)
    lo = (tile_off_ref[i] // eb) * eb
    hi = tile_off_ref[i + 1]
    nblocks = pl.cdiv(hi - lo, eb)
    acc_ref[:] = jnp.zeros_like(acc_ref)

    def dma_v(slot, b):
        start = pl.multiple_of(lo + b * eb, eb)
        return pltpu.make_async_copy(vals_hbm.at[pl.ds(start, eb), :],
                                     vbuf.at[slot], sems.at[slot, 0])

    def dma_i(slot, b):
        start = pl.multiple_of(lo + b * eb, eb)
        return pltpu.make_async_copy(ids_hbm.at[:, pl.ds(start, eb)],
                                     ibuf.at[slot], sems.at[slot, 1])

    @pl.when(nblocks > 0)
    def _():
        dma_v(0, 0).start()
        dma_i(0, 0).start()

    def body(b, _):
        slot = b % 2

        @pl.when(b + 1 < nblocks)
        def _():
            dma_v((b + 1) % 2, b + 1).start()
            dma_i((b + 1) % 2, b + 1).start()

        dma_v(slot, b).wait()
        dma_i(slot, b).wait()
        dt = dot_dtype or jnp.float32
        vals = vbuf[slot].astype(dt)                        # (EB, DL)
        id_row = ibuf[slot][0:1, :]                         # (1, EB)
        rows = (i * nb
                + jax.lax.broadcasted_iota(jnp.int32, (nb, eb), 0)
                ).astype(jnp.float32)
        onehot_t = (id_row == rows).astype(dt)              # (NB, EB)
        acc_ref[:] += jax.lax.dot_general(
            onehot_t, vals, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)             # (NB, DL)
        return 0

    jax.lax.fori_loop(0, nblocks, body, 0)


def segment_sum_pallas_rows(values: jax.Array,   # (E_rows, DL) row-major
                            segment_ids: jax.Array,  # (E,) int32 sorted
                            num_segments: int,
                            *,
                            eb: int = 1024,
                            nb: int = 256,
                            interpret: bool = False,
                            vma: tuple = (),
                            no_transpose: bool = False,
                            dot_dtype=None) -> jax.Array:
    """Sorted segment sum over ROW-major values whose row count may
    exceed len(segment_ids) by >= eb (over-read region must be zeros —
    e.g. the split backward's d_h output). Lane count must be a multiple
    of 128. Returns (num_segments, DL).

    no_transpose=True uses the _kernel_rows_nt formulation (mixed-axis
    MXU contraction, no per-block transpose, row-major accumulator).
    dot_dtype=jnp.bfloat16 (nt only) runs the one-hot contraction at
    the MXU's native single-pass rate — the f32 dot runs a multi-pass
    decomposition; values are bf16-rounded before the f32-accumulated
    sum (the GEMM-input rounding class, probe_bwd_path measures it)."""
    e = segment_ids.shape[0]
    e_rows, dl = values.shape
    assert dl % 128 == 0, dl
    assert e_rows >= e + eb, (e_rows, e, eb)
    d8 = dl
    t = pl.cdiv(num_segments, nb)
    n_pad = t * nb

    ids = jnp.pad(segment_ids.astype(jnp.float32)[None, :],
                  ((0, 8 - 1), (0, e_rows - e)),
                  constant_values=float(n_pad))

    bounds = jnp.arange(t + 1, dtype=jnp.int32) * nb
    if vma:
        bounds = jax.lax.pcast(bounds, tuple(vma), to="varying")
    tile_off = jnp.searchsorted(segment_ids, bounds, side="left"
                                ).astype(jnp.int32)

    out_spec = (pl.BlockSpec((nb, dl), lambda i, *_: (i, 0),
                             memory_space=pltpu.VMEM)
                if no_transpose else
                pl.BlockSpec((d8, nb), lambda i, *_: (0, i),
                             memory_space=pltpu.VMEM))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(t,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
                  pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM)],
        out_specs=out_spec,
        scratch_shapes=[
            pltpu.VMEM((2, eb, dl), values.dtype),
            pltpu.VMEM((2, 8, eb), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
    )
    sds_kw = {"vma": frozenset(vma)} if vma else {}
    if no_transpose:
        acc = pl.pallas_call(
            functools.partial(_kernel_rows_nt, eb=eb, nb=nb, dl=dl,
                              dot_dtype=dot_dtype),
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((n_pad, dl), jnp.float32,
                                           **sds_kw),
            cost_estimate=pl.CostEstimate(
                flops=2 * (e + eb) * nb * d8,
                bytes_accessed=(e + eb) * (dl + 8) * 4 + n_pad * d8 * 4,
                transcendentals=0),
            interpret=interpret,
        )(tile_off, values, ids)
        return acc[:num_segments, :]
    acc = pl.pallas_call(
        functools.partial(_kernel_rows, eb=eb, nb=nb, d8=d8, dl=dl),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((d8, n_pad), jnp.float32, **sds_kw),
        cost_estimate=pl.CostEstimate(
            flops=2 * (e + eb) * nb * d8,
            bytes_accessed=(e + eb) * (dl + 8) * 4 + n_pad * d8 * 4,
            transcendentals=0),
        interpret=interpret,
    )(tile_off, values, ids)
    return acc.T[:num_segments, :]


def segment_sum_pallas(values: jax.Array,       # (E, D) f32
                       segment_ids: jax.Array,  # (E,) int32 sorted asc
                       num_segments: int,
                       *,
                       eb: int = 1024,
                       nb: int = 128,
                       interpret: bool = False,
                       vma: tuple = ()) -> jax.Array:
    """Sorted segment sum on the MXU; returns (num_segments, D).
    vma: mesh axes this call varies over (shard_map check_vma)."""
    e, d = values.shape
    d8 = _round_up(d, 8)
    t = pl.cdiv(num_segments, nb)
    n_pad = t * nb

    def pad_part(a_t, rows, fill):
        return jnp.pad(a_t, ((0, rows - a_t.shape[0]), (0, eb)),
                       constant_values=fill)

    packed = jnp.concatenate([
        pad_part(values.T, d8, 0.0),
        pad_part(segment_ids.astype(jnp.float32)[None, :], 8,
                 float(n_pad)),
    ], axis=0)

    bounds = jnp.arange(t + 1, dtype=jnp.int32) * nb
    tile_off = jnp.searchsorted(segment_ids, bounds, side="left"
                                ).astype(jnp.int32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(t,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM)],
        out_specs=pl.BlockSpec((d8, nb), lambda i, *_: (0, i),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, d8 + 8, eb), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    sds_kw = {"vma": frozenset(vma)} if vma else {}
    acc = pl.pallas_call(
        functools.partial(_kernel, eb=eb, nb=nb, d8=d8),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((d8, n_pad), jnp.float32, **sds_kw),
        cost_estimate=pl.CostEstimate(
            flops=2 * (e + eb) * nb * d8,
            bytes_accessed=(e + eb) * (d8 + 8) * 4 + n_pad * d8 * 4,
            transcendentals=0),
        interpret=interpret,
    )(tile_off, packed)
    return acc.T[:num_segments, :d]
