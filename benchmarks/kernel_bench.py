"""Microbenchmark: fused Pallas segment-attention vs XLA segment ops.

Runs the isolated hot op (exp -> segment denominator -> weighted SpMM,
forward or forward+backward) on parametric synthetic graphs and prints
one JSON line per (backend, size) with edges/s and the HBM roofline
fraction. This is the per-kernel view behind bench.py's end-to-end
number.

    python benchmarks/kernel_bench.py                  # default sweep
    python benchmarks/kernel_bench.py --nodes 500000 --edges 5000000
    python benchmarks/kernel_bench.py --grad            # include backward
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_case(num_nodes, num_edges, nh, f, backend, grad, iters=10,
             eb=256, nb=128):
    import jax
    import jax.numpy as jnp

    from gat_pytorch_tpu.ops.pallas import segment_attention as fsa

    rng = np.random.default_rng(0)
    recv = np.sort(rng.integers(0, num_nodes, num_edges)).astype(np.int32)
    e_pad = ((num_edges + 255) // 256) * 256
    recv = np.concatenate([recv, np.full(e_pad - num_edges, num_nodes - 1,
                                         np.int32)])
    logits = rng.normal(size=(e_pad, nh)).astype(np.float32)
    logits[num_edges:] = fsa.NEG_INF
    h_src = rng.normal(size=(e_pad, nh * f)).astype(np.float32)

    logits_d = jax.device_put(jnp.asarray(logits))
    h_d = jax.device_put(jnp.asarray(h_src))
    recv_d = jax.device_put(jnp.asarray(recv))

    from gat_pytorch_tpu.utils.platform import is_tpu_backend

    def op(lg, hs):
        if backend == "pallas":
            out = fsa.fused_segment_attention(
                lg, hs, recv_d, None, num_nodes, nh, f, 1e-8, eb, nb,
                not is_tpu_backend())
        else:
            out = fsa.reference_segment_attention(
                lg, hs, recv_d, None, num_nodes, nh, f)
        return jnp.sum(out)

    if grad:
        g = jax.grad(op, argnums=(0, 1))
        # reduce on device — transferring E-sized gradient arrays through
        # the tunnelled backend would swamp the timing
        fn = jax.jit(lambda lg, hs: sum(jnp.sum(x) for x in g(lg, hs)))
    else:
        fn = jax.jit(op)

    out = fn(logits_d, h_d)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(logits_d, h_d)
    # force host transfer (tunneled-backend sync, see bench.py)
    np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]
    dt = (time.perf_counter() - t0) / iters

    # roofline: per edge read h (nh*f), logits (nh), recv; write per node
    bytes_ = num_edges * (nh * f + nh + 1) * 4 + num_nodes * (
        nh * f + nh) * 4
    if grad:
        bytes_ *= 3
    bw = float(os.environ.get("GAT_TPU_HBM_GBS", "819")) * 1e9
    sol_t = bytes_ / bw
    return {"backend": backend, "nodes": num_nodes, "edges": num_edges,
            "nh": nh, "f": f, "grad": grad, "eb": eb, "nb": nb,
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
