"""Mosaic capability probes: dynamic lane-axis gather inside a kernel.

The round-2 kernel plan (docs/PERF.md: kill the 8.28 ms XLA gather/pack
around the fused attention kernel) hinges on gathering columns of a
feature-major table h_t (NHF8, N) by a per-edge sender vector INSIDE the
kernel. This script compiles a battery of candidate formulations on the
real chip and reports which lower + their timings. Run in background:

    python benchmarks/probe_gather.py            # all probes
    python benchmarks/probe_gather.py --probe c  # one probe
"""

from __future__ import annotations

import argparse
import functools
import sys
import time
import traceback

import numpy as np

sys.path.insert(0, "/root/repo")


def _mk(num_rows, n, eb, seed=0):
    import jax.numpy as jnp
    rng = np.random.default_rng(seed)
    table = rng.normal(size=(num_rows, n)).astype(np.float32)
    idx = rng.integers(0, n, eb).astype(np.int32)
    return jnp.asarray(table), jnp.asarray(idx)


def probe_a_take_along_axis_narrow(R=128, N=2048, EB=512):
    """take_along_axis: operand (R, N), indices (R, EB) -- narrower out."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(tab_ref, idx_ref, out_ref):
        idx = jnp.broadcast_to(idx_ref[0:1, :], (tab_ref.shape[0],
                                                 idx_ref.shape[1]))
        out_ref[:] = jnp.take_along_axis(tab_ref[:], idx, axis=1)

    table, idx = _mk(R, N, EB)
    idx2 = idx[None, :]                       # (1, EB) int32
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((R, EB), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(table, idx2)
    want = np.asarray(table)[:, np.asarray(idx)]
    np.testing.assert_allclose(np.asarray(out), want)
    return "ok"


def probe_b_take_along_axis_same_shape(R=128, N=2048):
    """take_along_axis: operand (R, N), indices (R, N) -- same shape."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(tab_ref, idx_ref, out_ref):
        idx = jnp.broadcast_to(idx_ref[0:1, :], tab_ref.shape)
        out_ref[:] = jnp.take_along_axis(tab_ref[:], idx, axis=1)

    table, _ = _mk(R, N, N)
    rng = np.random.default_rng(1)
    idx = rng.integers(0, N, N).astype(np.int32)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((R, N), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(table, jnp.asarray(idx)[None, :])
    want = np.asarray(table)[:, idx]
    np.testing.assert_allclose(np.asarray(out), want)
    return "ok"


def probe_c_jnp_take_lanes(R=128, N=2048, EB=512):
    """jnp.take along axis 1 with a 1-D dynamic index vector."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(tab_ref, idx_ref, out_ref):
        out_ref[:] = jnp.take(tab_ref[:], idx_ref[0, :], axis=1)

    table, idx = _mk(R, N, EB)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((R, EB), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(table, idx[None, :])
    want = np.asarray(table)[:, np.asarray(idx)]
    np.testing.assert_allclose(np.asarray(out), want)
    return "ok"


def probe_d_sublane_gather(R=2048, C=256, EB=512):
    """Row (sublane-axis) gather: out[e, :] = tab[idx[e], :] via
    take_along_axis on axis 0."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(tab_ref, idx_ref, out_ref):
        idx = jnp.broadcast_to(idx_ref[:, 0:1], (idx_ref.shape[0],
                                                 tab_ref.shape[1]))
        out_ref[:] = jnp.take_along_axis(tab_ref[:], idx, axis=0)

    rng = np.random.default_rng(2)
    table = jnp.asarray(rng.normal(size=(R, C)).astype(np.float32))
    idx = rng.integers(0, R, EB).astype(np.int32)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((EB, C), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(table, jnp.asarray(idx)[:, None])
    want = np.asarray(table)[np.asarray(idx)]
    np.testing.assert_allclose(np.asarray(out), want)
    return "ok"


def probe_e_perf_strip_gather(R=64, N=4096, E=131072, iters=20):
    """Timing: gather E columns from a VMEM-resident (R, N) table in
    EB-wide strips inside one kernel (grid over strips). This is the
    Cora-shaped fast path: h_t resident, per-strip lane gather."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    EB = 2048

    def kernel(idx_ref, tab_ref, out_ref):
        i = pl.program_id(0)
        idx = idx_ref[0, pl.ds(i * EB, EB)]
        out_ref[:] = jnp.take(tab_ref[:], idx, axis=1)

    rng = np.random.default_rng(3)
    table = jnp.asarray(rng.normal(size=(R, N)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, N, E).astype(np.int32))

    @jax.jit
    def run(table, idx):
        return pl.pallas_call(
            kernel,
            grid=(E // EB,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((R, EB), lambda i: (0, i),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((R, E), jnp.float32),
        )(idx[None, :], table)

    out = run(table, idx)
    np.testing.assert_allclose(
        np.asarray(out[:, :EB]),
        np.asarray(table)[:, np.asarray(idx[:EB])])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = run(table, idx)
    float(np.asarray(out)[0, 0])     # host sync through the tunnel
    dt = (time.perf_counter() - t0) / iters
    gbps = E * R * 4 * 2 / dt / 1e9
    return f"ok {dt*1e3:.3f} ms ({gbps:.0f} GB/s eff for {E} gathers)"


def probe_f_dynamic_dma_rows(R=8, N=65536, EB=1024, C=512):
    """Per-edge dynamic DMA: copy EB rows of a (N, C) HBM table into VMEM
    one row-DMA each, inside a fori_loop. Measures descriptor-rate
    feasibility of a DMA-based gather."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(idx_ref, tab_hbm, out_ref, sem):
        def body(e, _):
            row = idx_ref[0, e]
            pltpu.make_async_copy(
                tab_hbm.at[pl.ds(row, 1), :],
                out_ref.at[pl.ds(e, 1), :],
                sem).start()
            pltpu.make_async_copy(
                tab_hbm.at[pl.ds(row, 1), :],
                out_ref.at[pl.ds(e, 1), :],
                sem).wait()
            return 0
        jax.lax.fori_loop(0, EB, body, 0)

    rng = np.random.default_rng(4)
    table = jnp.asarray(rng.normal(size=(N, C)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, N, EB).astype(np.int32))

    @jax.jit
    def run(idx, table):
        return pl.pallas_call(
            kernel,
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                      pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((EB, C), jnp.float32),
            scratch_shapes=[pltpu.SemaphoreType.DMA],
        )(idx[None, :], table)

    out = run(idx, table)
    np.testing.assert_allclose(np.asarray(out),
                               np.asarray(table)[np.asarray(idx)])
    iters = 20
    t0 = time.perf_counter()
    for _ in range(iters):
        out = run(idx, table)
    float(np.asarray(out)[0, 0])
    dt = (time.perf_counter() - t0) / iters
    rate = EB / dt
    return f"ok {dt*1e3:.3f} ms ({rate/1e6:.1f}M row-DMAs/s)"


def probe_g_same_shape_axis0(R=512, C=256):
    """Same-shape take_along_axis on axis 0 (sublane gather):
    out[i, c] = tab[idx[i, c], c], idx broadcast along lanes -> row
    gather of a row-major table, R rows per call."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(tab_ref, idx_ref, out_ref):
        idx = jnp.broadcast_to(idx_ref[:, 0:1], tab_ref.shape)
        out_ref[:] = jnp.take_along_axis(tab_ref[:], idx, axis=0)

    rng = np.random.default_rng(5)
    table = jnp.asarray(rng.normal(size=(R, C)).astype(np.float32))
    idx = rng.integers(0, R, R).astype(np.int32)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((R, C), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(table, jnp.asarray(idx)[:, None])
    want = np.asarray(table)[idx]
    np.testing.assert_allclose(np.asarray(out), want)
    return "ok"


def probe_h_same_shape_axis0_full_idx(R=512, C=256):
    """Axis-0 same-shape gather with full (R, C) idx materialised (no
    in-kernel broadcast — rules out layout inference on the broadcast)."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(tab_ref, idx_ref, out_ref):
        out_ref[:] = jnp.take_along_axis(tab_ref[:], idx_ref[:], axis=0)

    rng = np.random.default_rng(6)
    table = jnp.asarray(rng.normal(size=(R, C)).astype(np.float32))
    idx1 = rng.integers(0, R, R).astype(np.int32)
    idx = jnp.asarray(np.repeat(idx1[:, None], C, axis=1))
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((R, C), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(table, idx)
    want = np.asarray(table)[idx1]
    np.testing.assert_allclose(np.asarray(out), want)
    return "ok"


PROBES = {
    "a": probe_a_take_along_axis_narrow,
    "b": probe_b_take_along_axis_same_shape,
    "c": probe_c_jnp_take_lanes,
    "d": probe_d_sublane_gather,
    "e": probe_e_perf_strip_gather,
    "f": probe_f_dynamic_dma_rows,
    "g": probe_g_same_shape_axis0,
    "h": probe_h_same_shape_axis0_full_idx,
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--probe", default=None)
    args = ap.parse_args()
    import jax
    from gat_pytorch_tpu.utils.platform import is_tpu_backend
    print("backend:", jax.default_backend(), flush=True)
    ctx = None
    if not is_tpu_backend():
        # syntax/shape check only — lowering truth needs the real chip
        from jax.experimental.pallas import tpu as pltpu
        ctx = pltpu.force_tpu_interpret_mode()
        ctx.__enter__()
        print("(interpret mode — capability answers NOT authoritative)")
    keys = [args.probe] if args.probe else list(PROBES)
    for k in keys:
        t0 = time.perf_counter()
        try:
            msg = PROBES[k]()
            print(f"PROBE {k}: {msg}  [{time.perf_counter()-t0:.0f}s]",
                  flush=True)
        except Exception as exc:  # noqa: BLE001 - capability probe
            lines = [ln for ln in traceback.format_exc().splitlines()
                     if ln.strip() and "jax has removed" not in ln.lower()
                     and "JAX_TRACEBACK_FILTERING" not in ln]
            tail = " | ".join(ln.strip()[:160] for ln in lines[-4:])
            print(f"PROBE {k}: FAIL {type(exc).__name__}: {tail}  "
                  f"[{time.perf_counter()-t0:.0f}s]", flush=True)


if __name__ == "__main__":
    main()
