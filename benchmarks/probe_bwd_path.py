"""Backward d(h) path probe — VERDICT r4 item 1 groundwork.

The scale (random-expander) backward pays, per layer,
    take(d_h_rows, src_order)            ~23.5 ms  (random E-row permute)
  + segment_sum_pallas_rows(...)         ~20.3 ms  (sorted reduce, 6x
                                                    its 3.4 GB payload)
(docs/PERF.md round-4 decomposition). The permute runs at ~80% of the
4 KB/row tile floor (not improvable by dtype — H_DTYPE bf16 measured a
WASH, round 2); the reduce is ELEMENT-bound: its kernel does a per-block
(EB, 128) on-chip transpose before the one-hot MXU contraction, plus an
XLA (128, N_pad) transpose of the result. This probe measures, at the
scale shapes (500k nodes / 5.5M edges / 128 lanes):

  take_clip      jnp.take(d_h, src_order) — the production permute
  take_pib       raw lax.gather PROMISE_IN_BOUNDS (no clip pass)
  take_bf16      the same permute on bf16 rows (row-bound check at 5.5M)
  reduce_t_*     existing transpose kernel at (eb, nb) variants
  reduce_nt_*    the NEW no-transpose kernel (mixed-axis MXU form)

    python benchmarks/probe_bwd_path.py
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timed_scan(make_body, init_carry, inner, iters, rounds=3):
    import jax

    @jax.jit
    def block(carry):
        def body(c, _):
            return make_body(c), None
        c, _ = jax.lax.scan(body, carry, None, length=inner)
        return c

    def sync(carry):
        leaf = jax.tree_util.tree_leaves(carry)[-1]
        assert leaf.ndim == 0
        return float(np.asarray(leaf))

    carry = block(init_carry)
    sync(carry)
    best = float("inf")
    for _ in range(rounds):
        t0 = time.perf_counter()
        for _ in range(iters):
            carry = block(carry)
        sync(carry)
        best = min(best, (time.perf_counter() - t0) / (iters * inner))
    return best


def main() -> None:
    import jax
    import jax.numpy as jnp

    from gat_pytorch_tpu.ops.pallas.segment_sum import (
        segment_sum_pallas_rows)
    from gat_pytorch_tpu.utils.platform import is_tpu_backend

    inner = int(os.environ.get("GAT_TPU_BENCH_INNER", "10"))
    iters = int(os.environ.get("GAT_TPU_BENCH_ITERS", "3"))
    interp = not is_tpu_backend()

    n = int(os.environ.get("GAT_TPU_PROBE_NODES", "500000"))
    deg = int(os.environ.get("GAT_TPU_PROBE_DEG", "10"))
    dl = 128
    rng = np.random.default_rng(0)
    e = n * deg + n                      # + self loops, like canonicalize
    e_pad = ((e + 127) // 128) * 128
    senders = rng.integers(0, n, e_pad).astype(np.int32)
    src_order = np.argsort(senders, kind="stable").astype(np.int32)
    ids_sorted = senders[src_order]
    eb_ext = 2048                        # max eb probed below

    out = {"probe": "bwd_path", "nodes": n, "edges": int(e), "lanes": dl}

    d_h0 = jax.random.normal(jax.random.key(1), (e_pad + eb_ext, dl),
                             jnp.float32)
    perm = jnp.asarray(src_order)
    send_j = jnp.asarray(senders)

    # ---- permute variants ------------------------------------------------
    def take_clip_body(carry):
        d_h, s = carry
        g = jnp.take(d_h, perm, axis=0)
        val = jnp.sum(g[:8, :1])
        return (d_h * (1.0 + 0.0 * val), s + val)

    dt = timed_scan(take_clip_body, (d_h0, jnp.float32(0.0)), inner, iters)
    out["take_clip_ms"] = round(dt * 1e3, 3)

    def _take_pib(table, idx):
        return jax.lax.gather(
            table, idx[:, None],
            jax.lax.GatherDimensionNumbers(
                offset_dims=(1,), collapsed_slice_dims=(0,),
                start_index_map=(0,)),
            slice_sizes=(1, table.shape[1]),
            mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS)

    def take_pib_body(carry):
        d_h, s = carry
        g = _take_pib(d_h, perm)
        val = jnp.sum(g[:8, :1])
        return (d_h * (1.0 + 0.0 * val), s + val)

    dt = timed_scan(take_pib_body, (d_h0, jnp.float32(0.0)), inner, iters)
    out["take_pib_ms"] = round(dt * 1e3, 3)

    d_hb = d_h0.astype(jnp.bfloat16)

    def take_bf16_body(carry):
        d_h, s = carry
        g = _take_pib(d_h, perm)
        val = jnp.sum(g[:8, :1].astype(jnp.float32))
        return ((d_h * (1.0 + 0.0 * val)).astype(jnp.bfloat16), s + val)

    dt = timed_scan(take_bf16_body, (d_hb, jnp.float32(0.0)), inner, iters)
    out["take_bf16_ms"] = round(dt * 1e3, 3)

    # ---- reduce variants -------------------------------------------------
    ids_j = jnp.asarray(ids_sorted)
    rows0 = jax.random.normal(jax.random.key(2), (e_pad + eb_ext, dl),
                              jnp.float32)

    variants = [("t", False, None), ("nt", True, None),
                ("ntb", True, jnp.bfloat16)]
    only = os.environ.get("GAT_TPU_PROBE_ONLY")
    for tag, nt, ddt in variants:
        if only and tag not in only.split(","):
            continue
        cfgs = ((512, 256), (1024, 256), (1024, 512), (2048, 256),
                (2048, 512))
        env_cfgs = os.environ.get("GAT_TPU_PROBE_CFGS")
        if env_cfgs:
            cfgs = tuple(tuple(map(int, c.split("x")))
                         for c in env_cfgs.split(","))
        for eb, nb in cfgs:
            def body(carry, eb=eb, nb=nb, nt=nt, ddt=ddt):
                rows, s = carry
                d = segment_sum_pallas_rows(
                    rows, ids_j, n, eb=eb, nb=nb, interpret=interp,
                    no_transpose=nt, dot_dtype=ddt)
                val = jnp.sum(d[:8, :1])
                return (rows * (1.0 + 0.0 * val), s + val)

            dt = timed_scan(body, (rows0, jnp.float32(0.0)), inner, iters)
            out[f"reduce_{tag}_e{eb}_n{nb}_ms"] = round(dt * 1e3, 3)
            print(json.dumps({f"reduce_{tag}_e{eb}_n{nb}_ms":
                              out[f"reduce_{tag}_e{eb}_n{nb}_ms"]}),
                  flush=True)

    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
