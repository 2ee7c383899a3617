"""Microbenchmark: fused Pallas segment-attention vs XLA segment ops.

Runs the isolated hot op (exp -> segment denominator -> weighted SpMM,
forward or forward+backward) on parametric synthetic graphs and prints
one JSON line per (backend, size) with edges/s and the HBM roofline
fraction. This is the per-kernel view behind bench.py's end-to-end
number.

Backends:
  xla     — jax.ops.segment_sum oracle over a pre-gathered h_src
  pallas  — v3 packed kernel over a pre-gathered h_src (round-1 path)
  table   — v4 op from the NODE feature table: gather + layout + kernel
            owned by the op (fused_segment_attention_table); this is the
            composite the model actually runs, including the prep the
            other two exclude
  xla_t   — XLA oracle from the node table (gather included), the
            apples-to-apples baseline for `table`

Each timing scans GAT_TPU_BENCH_SCAN iterations of the op inside ONE
dispatch (a loop-carried perturbation defeats CSE) — per-dispatch tunnel
overhead is ~1 ms, which would swamp a ~3 ms op.

    python benchmarks/kernel_bench.py                  # default sweep
    python benchmarks/kernel_bench.py --nodes 100000 --edges 1000000 \
        --backends table xla_t --grad
    GAT_TPU_H_DTYPE=bfloat16 python benchmarks/kernel_bench.py ...
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_case(num_nodes, num_edges, nh, f, backend, grad, iters=5,
             eb=256, nb=128):
    import jax
    import jax.numpy as jnp

    from gat_pytorch_tpu.ops.pallas import segment_attention as fsa
    from gat_pytorch_tpu.utils.platform import is_tpu_backend

    interp = not is_tpu_backend()
    scan_len = int(os.environ.get("GAT_TPU_BENCH_SCAN",
                                  "10" if not interp else "1"))
    h_dtype = (jnp.bfloat16
               if os.environ.get("GAT_TPU_H_DTYPE") == "bfloat16"
               else jnp.float32)

    rng = np.random.default_rng(0)
    recv = np.sort(rng.integers(0, num_nodes, num_edges)).astype(np.int32)
    e_pad = ((num_edges + 255) // 256) * 256
    recv = np.concatenate([recv, np.full(e_pad - num_edges, num_nodes - 1,
                                         np.int32)])
    send = np.concatenate([rng.integers(0, num_nodes, num_edges),
                           np.zeros(e_pad - num_edges)]).astype(np.int32)
    order = np.argsort(send, kind="stable").astype(np.int32)
    logits = rng.normal(size=(e_pad, nh)).astype(np.float32)
    logits[num_edges:] = fsa.NEG_INF

    # All big arrays are passed as jit ARGUMENTS — closing over device
    # arrays embeds them as constants in the uploaded HLO (the tunneled
    # compiler rejects >~100MB bodies with HTTP 413, and constant-space
    # placement distorts the timing).
    logits_d = jax.device_put(jnp.asarray(logits))
    h_tab = rng.normal(size=(num_nodes, nh * f)).astype(np.float32)
    from_table = backend in ("table", "xla_t")
    hmat_d = jax.device_put(jnp.asarray(
        h_tab if from_table else h_tab[send]).astype(h_dtype))
    del h_tab
    recv_d = jax.device_put(jnp.asarray(recv))
    send_d = jax.device_put(jnp.asarray(send))
    order_d = jax.device_put(jnp.asarray(order))

    def op(lg, hmat, recv_a, send_a, order_a):
        if backend == "pallas":
            out = fsa.fused_segment_attention(
                lg, hmat.astype(jnp.float32), recv_a, None,
                num_nodes, nh, f, 1e-8, eb, nb, interp)
        elif backend == "table":
            out = fsa.fused_segment_attention_table(
                lg, hmat, send_a, recv_a, None, order_a,
                num_nodes, nh, f, 1e-8, eb, nb, interp)
        elif backend == "xla_t":
            hs = jnp.take(hmat, send_a, axis=0).astype(jnp.float32)
            out = fsa.reference_segment_attention(
                lg, hs, recv_a, None, num_nodes, nh, f)
        else:
            out = fsa.reference_segment_attention(
                lg, hmat.astype(jnp.float32), recv_a, None,
                num_nodes, nh, f)
        return jnp.sum(out)

    if grad:
        base = jax.grad(op, argnums=(0, 1))
        reduce_out = lambda g: jnp.sum(g[0]) + jnp.sum(g[1])  # noqa: E731
    else:
        base = op
        reduce_out = lambda v: v                              # noqa: E731

    def scanned(lg, hmat, recv_a, send_a, order_a):
        def body(acc, _):
            # perturb the FEATURE operand so the gather/pack is loop-
            # carried (a hoisted gather would amortise to ~0 and lie)
            scale = (1.0 + acc * 1e-30).astype(hmat.dtype)
            v = reduce_out(base(lg, hmat * scale, recv_a, send_a,
                                order_a))
            return v.astype(jnp.float32) * 1e-30, v
        acc, vs = jax.lax.scan(body, jnp.float32(0.0), None,
                               length=scan_len)
        return vs[-1]

    fn = jax.jit(scanned)
    out = fn(logits_d, hmat_d, recv_d, send_d, order_d)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(logits_d, hmat_d, recv_d, send_d, order_d)
    # force host transfer (tunneled-backend sync, see bench.py)
    float(np.asarray(out))
    dt = (time.perf_counter() - t0) / (iters * scan_len)

    # roofline: per edge read h (nh*f), logits (nh), recv; write per node
    hb = 2 if h_dtype == jnp.bfloat16 else 4
    bytes_ = num_edges * (nh * f * hb + (nh + 1) * 4) + num_nodes * (
        nh * f + nh) * 4
    if backend in ("table", "xla_t"):
        # gather included: + sequential table read + gathered write
        bytes_ += num_nodes * nh * f * hb + num_edges * nh * f * hb
    if grad:
        bytes_ *= 3
    bw = float(os.environ.get("GAT_TPU_HBM_GBS", "819")) * 1e9
    sol_t = bytes_ / bw
    return {"backend": backend, "nodes": num_nodes, "edges": num_edges,
            "nh": nh, "f": f, "grad": grad, "eb": eb, "nb": nb,
            "h_dtype": str(np.dtype(h_dtype if h_dtype != jnp.bfloat16
                                    else np.float16)).replace(
                "float16", "bfloat16"),
            "scan": scan_len,
            "ms": round(dt * 1e3, 3),
            "edges_per_s": round(num_edges / dt, 1),
            "sol_fraction": round(sol_t / dt, 4)}


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--nodes", type=int, default=None)
    p.add_argument("--edges", type=int, default=None)
    p.add_argument("--nh", type=int, default=8)
    p.add_argument("--f", type=int, default=16)
    p.add_argument("--grad", action="store_true")
    p.add_argument("--backends", nargs="*", default=["xla", "pallas"])
    p.add_argument("--eb", type=int, default=256)
    p.add_argument("--nb", type=int, default=128)
    args = p.parse_args(argv)

    if args.nodes:
        cases = [(args.nodes, args.edges or args.nodes * 10)]
    else:
        cases = [(10_000, 100_000), (100_000, 1_000_000),
                 (500_000, 5_000_000)]
    for n, e in cases:
        for backend in args.backends:
            print(json.dumps(run_case(n, e, args.nh, args.f, backend,
                                      args.grad, eb=args.eb, nb=args.nb)),
                  flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
