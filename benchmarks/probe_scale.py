"""Random-expander (scale workload) step decomposition — VERDICT r3
item 2: attribute the gap between the measured 5M-edge step and the
access-pattern-aware floor (scale_sol_tile 0.643), the v5-path
equivalent of the banded DMA ablation.

Pieces, each timed inside a lax.scan with a loop-carried perturbation
(per-dispatch tunnel overhead ~1 ms; closed-over arrays would embed in
the HLO upload):

  step_full    full train step (the bench.py scale line)
  step_fwd     loss only (no backward, no optimizer)
  op_fwd       fused_gat_table_autocap forward alone (layer-2 shape)
  op_grad      op forward + all gradients
  gather       ONE random node->edge row gather (the tile-tax crossing)
  scatter      ONE sorted-segment row scatter (the backward crossing)
  gemm         layer-1 feature GEMM fwd (the big (N,64) matmul)

    python benchmarks/probe_scale.py
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402


def timed_scan(make_body, init_carry, inner, iters, rounds=3):
    """Best-of-rounds seconds/iteration of a scanned body. The host sync
    transfers ONLY the trailing SCALAR carry leaf (every body threads a
    scalar accumulator last) — transferring a big leaf would time the
    tunnel, not the chip (a 256 MB carry measured ~280 ms/fetch and
    poisoned the first version of this probe)."""
    import jax

    @jax.jit
    def block(carry):
        def body(c, _):
            return make_body(c), None
        c, _ = jax.lax.scan(body, carry, None, length=inner)
        return c

    def sync(carry):
        leaf = jax.tree_util.tree_leaves(carry)[-1]
        assert leaf.ndim == 0, "scalar accumulator must be the last leaf"
        return float(np.asarray(leaf))

    carry = block(init_carry)    # compile + warmup
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

    from gat_pytorch_tpu.models import gat
    from gat_pytorch_tpu.ops.pallas import segment_attention as fsa
    from gat_pytorch_tpu.ops.pallas.segment_sum import segment_sum_pallas_rows
    from gat_pytorch_tpu.train import optim as O
    from gat_pytorch_tpu.train.trainer import TrainState, make_train_step
    from gat_pytorch_tpu.utils.platform import is_tpu_backend

    inner = int(os.environ.get("GAT_TPU_BENCH_INNER", "10"))
    iters = int(os.environ.get("GAT_TPU_BENCH_ITERS", "3"))
    interp = not is_tpu_backend()
    out = {}

    cfg, graph, task, lr, l2 = bench.scale_workload()
    e_real = int(np.asarray(graph.edge_mask).sum())
    n_pad, e_pad = graph.num_nodes, graph.num_edges
    out["edges"] = e_real

    # --- full step (the official line) --------------------------------
    dt = bench.measure_train_step(cfg, graph, task, lr, l2, inner, iters)
    out["step_full_ms"] = round(dt * 1e3, 3)

    # --- forward-only step ---------------------------------------------
    params = gat.init_gat_model(jax.random.key(0), cfg)

    def fwd_body(carry):
        p, s = carry
        logits = gat.gat_model_apply(p, cfg, graph, training=False)
        loss = task.loss(logits, graph, "train")
        # perturb one param leaf so the scan isn't hoisted
        p = jax.tree_util.tree_map(lambda v: v, p)
        p["layers"][0]["W"] = p["layers"][0]["W"] * (1.0 + 0.0 * loss)
        return (p, s + loss)

    dt = timed_scan(fwd_body, (params, jnp.float32(0.0)), inner, iters)
    out["step_fwd_ms"] = round(dt * 1e3, 3)

    # --- op-level: layer-2 shape (nh=8, f=16 -> nhf 128) over the real
    # edge structure (dst-sorted senders/receivers/src_order) ----------
    nh, f = 8, 16
    nhf = nh * f
    rngk = jax.random.key(1)
    h0 = jax.random.normal(rngk, (n_pad, nhf), jnp.float32)
    a_src = jax.random.normal(jax.random.key(2), (nhf, nh), jnp.float32) * 0.1
    a_dst = jax.random.normal(jax.random.key(3), (nhf, nh), jnp.float32) * 0.1
    er = jnp.int32(e_real)
    eb, nb = 512, 256

    def op_call(h):
        s_dst = jnp.dot(h, a_dst, preferred_element_type=jnp.float32)
        s_src = jnp.dot(h, a_src, preferred_element_type=jnp.float32)
        bound = jax.lax.stop_gradient(jnp.max(s_src) + jnp.max(s_dst))
        return fsa.fused_gat_table_autocap(
            h, a_src, s_dst, None, graph.senders, graph.receivers,
            graph.src_order, er, bound, n_pad, nh, f, 1e-8, 0.01,
            eb, nb, interp)

    def op_fwd_body(carry):
        h, s = carry
        o = op_call(h)
        val = jnp.sum(o[:8, :1])
        return (h * (1.0 + 0.0 * val), s + val)

    dt = timed_scan(op_fwd_body, (h0, jnp.float32(0.0)), inner, iters)
    out["op_fwd_ms"] = round(dt * 1e3, 3)

    def op_grad_body(carry):
        h, s = carry
        def loss_of(h, a):
            s_dst = jnp.dot(h, a[1], preferred_element_type=jnp.float32)
            s_src = jnp.dot(h, a[0], preferred_element_type=jnp.float32)
            bound = jax.lax.stop_gradient(jnp.max(s_src) + jnp.max(s_dst))
            o = fsa.fused_gat_table_autocap(
                h, a[0], s_dst, None, graph.senders, graph.receivers,
                graph.src_order, er, bound, n_pad, nh, f, 1e-8, 0.01,
                eb, nb, interp)
            return jnp.sum(o * o) * 1e-6
        g_h = jax.grad(loss_of)(h, (a_src, a_dst))
        val = jnp.sum(g_h[:8, :1])
        return (h + 0.0 * g_h, s + val)

    dt = timed_scan(op_grad_body, (h0, jnp.float32(0.0)), inner, iters)
    out["op_grad_ms"] = round(dt * 1e3, 3)

    # --- isolated crossings --------------------------------------------
    def gather_body(carry):
        h, s = carry
        rows = jnp.take(h, graph.senders, axis=0,
                        indices_are_sorted=False, unique_indices=False)
        val = jnp.sum(rows[:8, :1])
        return (h * (1.0 + 0.0 * val), s + val)

    dt = timed_scan(gather_body, (h0, jnp.float32(0.0)), inner, iters)
    out["gather_ms"] = round(dt * 1e3, 3)

    rows0 = jax.random.normal(jax.random.key(4), (e_pad + eb, nhf),
                              jnp.float32)
    ids_sorted = jnp.take(graph.senders, graph.src_order, axis=0)

    def scatter_body(carry):
        rows, s = carry
        d = segment_sum_pallas_rows(rows, ids_sorted, n_pad, eb=eb,
                                    nb=nb, interpret=interp)
        val = jnp.sum(d[:8, :1])
        return (rows * (1.0 + 0.0 * val), s + val)

    dt = timed_scan(scatter_body, (rows0, jnp.float32(0.0)), inner, iters)
    out["scatter_ms"] = round(dt * 1e3, 3)

    # --- layer-1 GEMM ----------------------------------------------------
    w0 = jax.random.normal(jax.random.key(5), (64, 128), jnp.float32)
    x0 = graph.x.astype(jnp.bfloat16) if os.environ.get(
        "GAT_TPU_GEMM_DTYPE") == "bfloat16" else graph.x

    def gemm_body(carry):
        w, s = carry
        h = jnp.dot(x0, w.astype(x0.dtype),
                    preferred_element_type=jnp.float32)
        val = jnp.sum(h[:8, :1])
        return (w * (1.0 + 0.0 * val), s + val)

    dt = timed_scan(gemm_body, (w0, jnp.float32(0.0)), inner, iters)
    out["gemm_ms"] = round(dt * 1e3, 3)

    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
