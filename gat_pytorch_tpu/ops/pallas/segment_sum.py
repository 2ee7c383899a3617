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
