"""Microbenchmark of the v5 whole-attention op (fused_gat_table_autocap).

Times the op the model actually dispatches at scale — node table in,
logits/cap/softmax/aggregate in-kernel (reference models/gat_layer.py:70-134
collapsed into one op) — forward and forward+all-gradients, inside a
lax.scan with a loop-carried feature perturbation (per-dispatch tunnel
overhead is ~1 ms; see kernel_bench.py).

Knobs: GAT_TPU_KERNEL_DTYPE=bfloat16 (MXU contraction inputs),
GAT_TPU_H_DTYPE=bfloat16 (gathered row table), GAT_TPU_BENCH_SCAN.

    python benchmarks/probe_v5.py --nodes 100000 --edges 1000000
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_case(num_nodes, num_edges, nh, f, grad, iters=5, eb=None, nb=None):
    import jax
    import jax.numpy as jnp

    from gat_pytorch_tpu.ops.pallas import segment_attention as fsa
    from gat_pytorch_tpu.utils.platform import is_tpu_backend

    interp = not is_tpu_backend()
    scan_len = int(os.environ.get("GAT_TPU_BENCH_SCAN",
                                  "10" if not interp else "1"))
    nhfl = ((nh * f + 127) // 128) * 128
    if eb is None:
        eb, nb = (512, 256) if nhfl <= 512 else (256, 128)

    rng = np.random.default_rng(0)
    recv = np.sort(rng.integers(0, num_nodes, num_edges)).astype(np.int32)
    e_pad = ((num_edges + eb - 1) // eb) * eb
    recv = np.concatenate([recv, np.full(e_pad - num_edges, num_nodes - 1,
                                         np.int32)])
    send = np.concatenate([rng.integers(0, num_nodes, num_edges),
                           np.zeros(e_pad - num_edges)]).astype(np.int32)
    order = np.argsort(send, kind="stable").astype(np.int32)

    h = jax.device_put(jnp.asarray(
        rng.normal(size=(num_nodes, nh * f)).astype(np.float32)))
    a_src = jax.device_put(jnp.asarray(
        rng.normal(size=(nh * f, nh)).astype(np.float32) * 0.1))
    s_dst = jax.device_put(jnp.asarray(
        rng.normal(size=(num_nodes, nh)).astype(np.float32)))
    recv_d = jax.device_put(jnp.asarray(recv))
    send_d = jax.device_put(jnp.asarray(send))
    order_d = jax.device_put(jnp.asarray(order))
    e_real = jnp.int32(num_edges)

    def op(h, a_src, s_dst):
        out = fsa.fused_gat_table_autocap(
            h, a_src, s_dst, None, send_d, recv_d, order_d, e_real,
            None, num_nodes, nh, f, 1e-8, 0.01, eb, nb, interp)
        return jnp.sum(out)

    if grad:
        base = jax.grad(op, argnums=(0, 1, 2))
        reduce_out = lambda g: sum(jnp.sum(x) for x in g)      # noqa: E731
    else:
        base = op
        reduce_out = lambda v: v                               # noqa: E731

    def scanned(h, a_src, s_dst):
        def body(acc, _):
            scale = (1.0 + acc * 1e-30).astype(h.dtype)
            v = reduce_out(base(h * scale, a_src, s_dst))
            return v.astype(jnp.float32) * 1e-30, v
        _, vs = jax.lax.scan(body, jnp.float32(0.0), None,
                             length=scan_len)
        return vs[-1]

    fn = jax.jit(scanned)
    out = fn(h, a_src, s_dst)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(h, a_src, s_dst)
    float(np.asarray(out))   # host transfer = true sync on the tunnel
    dt = (time.perf_counter() - t0) / (iters * scan_len)

    # roofline: table read + gathered rows write+read (cap pass re-reads),
    # meta, node outputs; grad ~3x the streams
    bytes_ = (num_nodes * nh * f * 4 + 3 * num_edges * nhfl * 4
              + num_edges * 8 + num_nodes * (nh * f + nh) * 4)
    if grad:
        bytes_ *= 3
    bw = float(os.environ.get("GAT_TPU_HBM_GBS", "819")) * 1e9
    return {"op": "fused_gat_table_autocap", "nodes": num_nodes,
            "edges": num_edges, "nh": nh, "f": f, "grad": grad,
            "eb": eb, "nb": nb,
            "kernel_dtype": os.environ.get("GAT_TPU_KERNEL_DTYPE", "f32"),
            "h_dtype": os.environ.get("GAT_TPU_H_DTYPE", "f32"),
            "scan": scan_len, "ms": round(dt * 1e3, 3),
            "edges_per_s": round(num_edges / dt, 1),
            "sol_fraction": round(bytes_ / bw / dt, 4)}


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--nodes", type=int, default=100_000)
    p.add_argument("--edges", type=int, default=1_000_000)
    p.add_argument("--nh", type=int, default=8)
    p.add_argument("--f", type=int, default=16)
    p.add_argument("--eb", type=int, default=None)
    p.add_argument("--nb", type=int, default=None)
    p.add_argument("--fwd_only", action="store_true")
    args = p.parse_args(argv)
    grads = [False] if args.fwd_only else [False, True]
    for g in grads:
        print(json.dumps(run_case(args.nodes, args.edges, args.nh,
                                  args.f, g, eb=args.eb, nb=args.nb)),
              flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
