"""Bisect the v4 table composite on-chip: which stage balloons?

Each stage is timed under the SAME harness as kernel_bench (scan of
GAT_TPU_BENCH_SCAN iterations per dispatch, feature operand perturbed by
the loop carry, all arrays as jit args).

    python benchmarks/probe_bisect_v4.py
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    import jax
    import jax.numpy as jnp
    from gat_pytorch_tpu.ops.pallas import segment_attention as fsa
    from gat_pytorch_tpu.utils.platform import is_tpu_backend

    n, e, nh, f = 100_000, 1_000_000, 8, 16
    nhf8 = 128
    nh8 = 8
    eb, nb = 256, 128
    interp = not is_tpu_backend()
    scan_len = int(os.environ.get("GAT_TPU_BENCH_SCAN", "10"))

    rng = np.random.default_rng(0)
    recv = np.sort(rng.integers(0, n, e)).astype(np.int32)
    e_pad = e
    send = rng.integers(0, n, e_pad).astype(np.int32)
    logits = rng.normal(size=(e_pad, nh)).astype(np.float32)
    h_tab = rng.normal(size=(n, nhf8)).astype(np.float32)
    h_src_t = np.ascontiguousarray(h_tab[send[:e_pad]].T)    # (NHF8, E)
    h_src_t = np.concatenate(
        [h_src_t, np.zeros((nhf8, eb), np.float32)], axis=1)
    h_src_rm = np.concatenate(
        [h_tab[send[:e_pad]], np.zeros((eb, nhf8), np.float32)], axis=0)

    lg_d = jax.device_put(jnp.asarray(logits))
    h_d = jax.device_put(jnp.asarray(h_tab))
    hst_d = jax.device_put(jnp.asarray(h_src_t))
    hsr_d = jax.device_put(jnp.asarray(h_src_rm))
    recv_d = jax.device_put(jnp.asarray(recv))
    send_d = jax.device_put(jnp.asarray(send))

    def scanned(body):
        def run(*args):
            def it(acc, _):
                v = body(acc, *args)
                return v * 1e-30, v
            acc, vs = jax.lax.scan(it, jnp.float32(0.0), None,
                                   length=scan_len)
            return vs[-1]
        return jax.jit(run)

    def bench(name, body, *args, iters=3):
        fn = scanned(body)
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        float(np.asarray(out))
        dt = (time.perf_counter() - t0) / (iters * scan_len)
        print(json.dumps({"stage": name, "ms": round(dt * 1e3, 3),
                          "compile_s": round(compile_s, 1)}), flush=True)

    # 1. row gather alone (perturbed table -> not hoistable)
    bench("gather_row", lambda acc, h, s:
          jnp.sum(jnp.take(h * (1.0 + acc * 1e-30), s, axis=0)),
          h_d, send_d)
    # 2. row gather + transpose, materialised via sum of the T
    bench("gather_row_T", lambda acc, h, s:
          jnp.sum(jnp.take(h * (1.0 + acc * 1e-30), s, axis=0).T * 2.0),
          h_d, send_d)
    # 3. meta pack alone
    bench("pack_meta", lambda acc, lg, r:
          jnp.sum(fsa.pack_meta(lg * (1.0 + acc * 1e-30), None, r,
                                8, eb)),
          lg_d, recv_d)
    # 4. kernel alone, edge-major pregathered input
    def kern_t(acc, lg, hst, r):
        out, _, _ = fsa._forward_split(
            lg * (1.0 + acc * 1e-30), hst, r, None, n, nh, f,
            eps=1e-8, eb=eb, nb=nb, interpret=interp, h_rowmajor=False)
        return jnp.sum(out)
    bench("kernel_edgemajor", kern_t, lg_d, hst_d, recv_d)
    # 5. kernel alone, ROW-major pregathered input (in-kernel transpose)
    def kern_r(acc, lg, hsr, r):
        out, _, _ = fsa._forward_split(
            lg * (1.0 + acc * 1e-30), hsr, r, None, n, nh, f,
            eps=1e-8, eb=eb, nb=nb, interpret=interp, h_rowmajor=True)
        return jnp.sum(out)
    bench("kernel_rowmajor", kern_r, lg_d, hsr_d, recv_d)
    # 6. full table composite, rowk mode
    os.environ["GAT_TPU_GATHER"] = "rowk"
    def full(acc, lg, h, s, r):
        out = fsa.fused_segment_attention_table(
            lg, h * (1.0 + acc * 1e-30), s, r, None, None,
            n, nh, f, 1e-8, eb, nb, interp)
        return jnp.sum(out)
    bench("composite_rowk", full, lg_d, h_d, send_d, recv_d)


if __name__ == "__main__":
    main()


def sweep_blocks():
    """eb/nb/dtype sweep of the rowk composite (fast compiles)."""
    import itertools
    import jax
    import jax.numpy as jnp
    from gat_pytorch_tpu.ops.pallas import segment_attention as fsa
    from gat_pytorch_tpu.utils.platform import is_tpu_backend

    n, e, nh, f = 100_000, 1_000_000, 8, 16
    interp = not is_tpu_backend()
    scan_len = int(os.environ.get("GAT_TPU_BENCH_SCAN", "10"))
    rng = np.random.default_rng(0)
    recv = np.sort(rng.integers(0, n, e)).astype(np.int32)
    send = rng.integers(0, n, e).astype(np.int32)
    logits = rng.normal(size=(e, nh)).astype(np.float32)
    h_tab = rng.normal(size=(n, 128)).astype(np.float32)
    lg_d = jax.device_put(jnp.asarray(logits))
    h_d = jax.device_put(jnp.asarray(h_tab))
    recv_d = jax.device_put(jnp.asarray(recv))
    send_d = jax.device_put(jnp.asarray(send))

    os.environ["GAT_TPU_GATHER"] = "rowk"
    for dt, eb, nb in itertools.product(
            ("float32", "bfloat16"), (256, 512, 1024), (128, 256)):
        os.environ["GAT_TPU_H_DTYPE"] = dt

        def full(acc, lg, h, s, r, eb=eb, nb=nb):
            out = fsa.fused_segment_attention_table(
                lg, h * (1.0 + acc * 1e-30), s, r, None, None,
                n, nh, f, 1e-8, eb, nb, interp)
            return jnp.sum(out)

        def run(lg, h, s, r):
            def it(acc, _):
                v = full(acc, lg, h, s, r)
                return v * 1e-30, v
            acc, vs = jax.lax.scan(it, jnp.float32(0.0), None,
                                   length=scan_len)
            return vs[-1]

        fn = jax.jit(run)
        try:
            out = fn(lg_d, h_d, send_d, recv_d)
            jax.block_until_ready(out)
            t0 = time.perf_counter()
            for _ in range(3):
                out = fn(lg_d, h_d, send_d, recv_d)
            float(np.asarray(out))
            ms = (time.perf_counter() - t0) / (3 * scan_len) * 1e3
            print(json.dumps({"dt": dt, "eb": eb, "nb": nb,
                              "ms": round(ms, 3),
                              "edges_per_s": round(e / ms * 1e3)}),
                  flush=True)
        except Exception as exc:  # noqa: BLE001
            print(json.dumps({"dt": dt, "eb": eb, "nb": nb,
                              "error": str(exc)[:160]}), flush=True)


def sweep_blocks2():
    """Bigger tiles + bf16 MXU contraction dtype."""
    import itertools
    import jax
    import jax.numpy as jnp
    from gat_pytorch_tpu.ops.pallas import segment_attention as fsa
    from gat_pytorch_tpu.utils.platform import is_tpu_backend

    n, e, nh, f = 100_000, 1_000_000, 8, 16
    interp = not is_tpu_backend()
    scan_len = int(os.environ.get("GAT_TPU_BENCH_SCAN", "10"))
    rng = np.random.default_rng(0)
    recv = np.sort(rng.integers(0, n, e)).astype(np.int32)
    send = rng.integers(0, n, e).astype(np.int32)
    logits = rng.normal(size=(e, nh)).astype(np.float32)
    h_tab = rng.normal(size=(n, 128)).astype(np.float32)
    lg_d = jax.device_put(jnp.asarray(logits))
    h_d = jax.device_put(jnp.asarray(h_tab))
    recv_d = jax.device_put(jnp.asarray(recv))
    send_d = jax.device_put(jnp.asarray(send))

    os.environ["GAT_TPU_GATHER"] = "rowk"
    os.environ["GAT_TPU_H_DTYPE"] = "bfloat16"
    for kdt, eb, nb in itertools.product(
            ("float32", "bfloat16"), (1024, 2048), (256, 512)):
        os.environ["GAT_TPU_KERNEL_DTYPE"] = kdt

        def full(acc, lg, h, s, r, eb=eb, nb=nb):
            out = fsa.fused_segment_attention_table(
                lg, h * (1.0 + acc * 1e-30), s, r, None, None,
                n, nh, f, 1e-8, eb, nb, interp)
            return jnp.sum(out)

        def run(lg, h, s, r):
            def it(acc, _):
                v = full(acc, lg, h, s, r)
                return v * 1e-30, v
            acc, vs = jax.lax.scan(it, jnp.float32(0.0), None,
                                   length=scan_len)
            return vs[-1]

        fn = jax.jit(run)
        try:
            out = fn(lg_d, h_d, send_d, recv_d)
            jax.block_until_ready(out)
            t0 = time.perf_counter()
            for _ in range(3):
                out = fn(lg_d, h_d, send_d, recv_d)
            float(np.asarray(out))
            ms = (time.perf_counter() - t0) / (3 * scan_len) * 1e3
            print(json.dumps({"kdt": kdt, "eb": eb, "nb": nb,
                              "ms": round(ms, 3),
                              "edges_per_s": round(e / ms * 1e3)}),
                  flush=True)
        except Exception as exc:  # noqa: BLE001
            print(json.dumps({"kdt": kdt, "eb": eb, "nb": nb,
                              "error": str(exc)[:160]}), flush=True)


def bisect_bwd():
    """Which backward stage balloons?"""
    import jax
    import jax.numpy as jnp
    from gat_pytorch_tpu.ops.pallas import segment_attention as fsa
    from gat_pytorch_tpu.ops.pallas.segment_attention_bwd import (
        backward_split)
    from gat_pytorch_tpu.ops.pallas.segment_sum import (
        segment_sum_pallas_rows)
    from gat_pytorch_tpu.utils.platform import is_tpu_backend

    n, e, nh, f = 100_000, 1_000_000, 8, 16
    eb, nb = 1024, 256
    interp = not is_tpu_backend()
    scan_len = int(os.environ.get("GAT_TPU_BENCH_SCAN", "10"))
    rng = np.random.default_rng(0)
    recv_np = np.sort(rng.integers(0, n, e)).astype(np.int32)
    send_np = rng.integers(0, n, e).astype(np.int32)
    order_np = np.argsort(send_np, kind="stable").astype(np.int32)
    lg = jax.device_put(jnp.asarray(
        rng.normal(size=(e, nh)).astype(np.float32)))
    h = jax.device_put(jnp.asarray(
        rng.normal(size=(n, 128)).astype(np.float32)))
    dh = jax.device_put(jnp.asarray(
        rng.normal(size=(e + eb, 128)).astype(np.float32)))
    meta = jax.device_put(jnp.asarray(
        rng.normal(size=(16, e + eb)).astype(np.float32)))
    g = jax.device_put(jnp.asarray(
        rng.normal(size=(n, 128)).astype(np.float32)))
    denom = jax.device_put(jnp.asarray(
        np.abs(rng.normal(size=(n, nh))).astype(np.float32)))
    recv = jax.device_put(jnp.asarray(recv_np))
    send = jax.device_put(jnp.asarray(send_np))
    order = jax.device_put(jnp.asarray(order_np))

    def scanned(body):
        def run(*args):
            def it(acc, _):
                v = body(acc, *args)
                return v * 1e-30, v
            acc, vs = jax.lax.scan(it, jnp.float32(0.0), None,
                                   length=scan_len)
            return vs[-1]
        return jax.jit(run)

    def bench(name, body, *args, iters=3):
        fn = scanned(body)
        out = fn(*args)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        float(np.asarray(out))
        dt = (time.perf_counter() - t0) / (iters * scan_len)
        print(json.dumps({"stage": name, "ms": round(dt * 1e3, 3)}),
              flush=True)

    def bwd_kernel(acc, dhh, mm, gg, dd):
        d_h, d_meta = backward_split(
            dhh * (1.0 + acc * 1e-30), mm, recv, gg, gg, dd,
            n, nh, f, eps=1e-8, eb=eb, nb=nb, with_dropout=False,
            interpret=interp, h_rowmajor=True)
        return jnp.sum(d_h[0]) + jnp.sum(d_meta[0])
    bench("bwd_kernel", bwd_kernel, dh, meta, g, denom)

    def scatter_rows(acc, dhh):
        ext = jnp.arange(e, e + eb, dtype=order.dtype)
        gs = jnp.take(dhh * (1.0 + acc * 1e-30),
                      jnp.concatenate([order, ext]), axis=0)
        ids = jnp.take(send, order, axis=0)
        dt_ = segment_sum_pallas_rows(gs, ids, n, eb=eb, nb=nb,
                                      interpret=interp)
        return jnp.sum(dt_[0])
    bench("scatter_rows", scatter_rows, dh)

    def full_grad(acc, lgg, hh):
        def loss(lgg, hh):
            out = fsa.fused_segment_attention_table(
                lgg, hh, send, recv, None, order, n, nh, f,
                1e-8, eb, nb, interp)
            return jnp.sum(out)
        gl, gh = jax.grad(loss, argnums=(0, 1))(
            lgg, hh * (1.0 + acc * 1e-30))
        return jnp.sum(gl) + jnp.sum(gh)
    bench("full_grad", full_grad, lg, h)

    def fwd_only(acc, lgg, hh):
        out = fsa.fused_segment_attention_table(
            lgg, hh * (1.0 + acc * 1e-30), send, recv, None, order,
            n, nh, f, 1e-8, eb, nb, interp)
        return jnp.sum(out)
    bench("fwd_only", fwd_only, lg, h)
