"""Microbenchmark: v6 windowed-gather whole-attention op vs the v5
table op (both own their node->edge data movement, so this is the
apples-to-apples composite view).

Backends:
  v5  — fused_gat_table_autocap (XLA row gather feeds the kernel; the
        two random node<->edge row crossings remain in XLA)
  v6  — fused_gat_window (per-dst-tile source window streamed to VMEM,
        gather/scatter via one-hot MXU contraction; zero random row
        crossings). --band 0 (default) uses whole-table-resident mode
        on an unstructured graph; --band W draws senders within W of
        their (sorted) receivers and certifies the real window via
        compute_src_windows — the canonicalize(reorder='rcm') case.

Timing: GAT_TPU_BENCH_SCAN iterations inside ONE dispatch with a
loop-carried perturbation (tunnel dispatch ~1 ms would swamp small ops);
sync via a small host transfer that data-depends on all work.

    python benchmarks/window_bench.py --nodes 2816 --edges 13312 \
        --nh 8 --f 8 --grad --backends v5 v6
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_case(num_nodes, num_edges, nh, f, backend, grad, band, iters=5):
    import jax
    import jax.numpy as jnp

    from gat_pytorch_tpu.graph.transforms import compute_src_windows
    from gat_pytorch_tpu.ops.pallas import segment_attention as fsa
    from gat_pytorch_tpu.ops.pallas import segment_attention_window as fsw
    from gat_pytorch_tpu.utils.platform import is_tpu_backend

    interp = not is_tpu_backend()
    scan_len = int(os.environ.get("GAT_TPU_BENCH_SCAN",
                                  "10" if not interp else "1"))

    rng = np.random.default_rng(0)
    recv = np.sort(rng.integers(0, num_nodes, num_edges)).astype(np.int32)
    if band:
        send = np.clip(recv + rng.integers(-band // 2, band // 2,
                                           num_edges),
                       0, num_nodes - 1).astype(np.int32)
    else:
        send = rng.integers(0, num_nodes, num_edges).astype(np.int32)
    e_pad = ((num_edges + 511) // 512) * 512
    recv = np.concatenate([recv, np.full(e_pad - num_edges, num_nodes - 1,
                                         np.int32)])
    send = np.concatenate([send, np.full(e_pad - num_edges, num_nodes - 1,
                                         np.int32)])
    order = np.argsort(send, kind="stable").astype(np.int32)
    tile_lo, src_band = compute_src_windows(send, recv, num_edges,
                                            num_nodes)
    n_rows8 = ((num_nodes + 7) // 8) * 8
    window = n_rows8
    if band and src_band > 0:
        window = min(((src_band + 7) // 8) * 8, n_rows8)
    if not band:
        tile_lo = np.zeros_like(tile_lo)

    h = rng.normal(size=(num_nodes, nh * f)).astype(np.float32)
    a_src = (rng.normal(size=(nh * f, nh)) / np.sqrt(nh * f)).astype(
        np.float32)
    s_dst = rng.normal(size=(num_nodes, nh)).astype(np.float32)

    h_d = jax.device_put(jnp.asarray(h))
    a_d = jax.device_put(jnp.asarray(a_src))
    s_d = jax.device_put(jnp.asarray(s_dst))
    recv_d = jax.device_put(jnp.asarray(recv))
    send_d = jax.device_put(jnp.asarray(send))
    order_d = jax.device_put(jnp.asarray(order))
    tl_d = jax.device_put(jnp.asarray(tile_lo))
    er = jnp.int32(num_edges)

    nhfl = ((nh * f + 127) // 128) * 128
    eb, nb = (512, 256) if nhfl <= 512 else (256, 128)

    def op(hh, aa, ss):
        if backend == "v5":
            out = fsa.fused_gat_table_autocap(
                hh, aa, ss, None, send_d, recv_d, order_d, er, None,
                num_nodes, nh, f, 1e-8, 0.01, eb, nb, interp)
        else:
            out = fsw.fused_gat_window(
                hh, aa, ss, None, send_d, recv_d, er, tl_d,
                num_nodes, nh, f, window, 1e-8, 0.01, eb, nb, interp)
        return jnp.sum(out)

    if grad:
        base = jax.grad(op, argnums=(0, 1, 2))
        reduce_out = lambda g: sum(jnp.sum(x) for x in g)  # noqa: E731
    else:
        base = op
        reduce_out = lambda v: v                           # noqa: E731

    def scanned(hh, aa, ss):
        def body(acc, _):
            scale = 1.0 + acc * 1e-30
            v = reduce_out(base(hh * scale, aa, ss))
            return v.astype(jnp.float32) * 1e-30, v
        acc, vs = jax.lax.scan(body, jnp.float32(0.0), None,
                               length=scan_len)
        return vs[-1]

    fn = jax.jit(scanned)
    out = fn(h_d, a_d, s_d)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(h_d, a_d, s_d)
    float(np.asarray(out))
    dt = (time.perf_counter() - t0) / (iters * scan_len)

    return {"backend": backend, "nodes": num_nodes, "edges": num_edges,
            "nh": nh, "f": f, "grad": grad, "band": band,
            "window": window if backend == "v6" else None,
            "eb": eb, "nb": nb, "scan": scan_len,
            "ms": round(dt * 1e3, 3),
            "edges_per_s": round(num_edges / dt, 1)}


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--nodes", type=int, default=2816)
    p.add_argument("--edges", type=int, default=13312)
    p.add_argument("--nh", type=int, default=8)
    p.add_argument("--f", type=int, default=8)
    p.add_argument("--grad", action="store_true")
    p.add_argument("--band", type=int, default=0)
    p.add_argument("--backends", nargs="*", default=["v5", "v6"])
    args = p.parse_args(argv)
    for backend in args.backends:
        print(json.dumps(run_case(args.nodes, args.edges, args.nh,
                                  args.f, backend, args.grad,
                                  args.band)),
              flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
