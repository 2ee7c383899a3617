"""Small-op-tail + MXU-rate probes (round 3 planning).

Decomposes the Cora-scale ~0.68 ms/step into attributable pieces and
measures the matmul rates needed to cost a windowed one-hot gather
design (docs/PERF.md round-2 close: the node->edge random-row crossings
are the remaining scale floor — a window expansion matmul would replace
them iff MXU rate makes 2*E*W*NHFL FLOPs cheaper than E 4 KB tile
reads).

Stages (all scanned GAT_TPU_BENCH_SCAN times in one dispatch, loss
threaded through the carry so the tunnel can't hide work):

    null        carry passthrough (scan + dispatch floor)
    fold_only   one rng fold_in (the dep-threading idiom's own cost)
    adam_tree   optax adam+l2 on the real Cora param tree
    adam_flat   the same update on ONE flat vector of equal size
    cora_grad   value_and_grad of the Cora loss (no optimizer)
    mm_peak_f32/bf16   4096^3 matmul rate (TFLOP/s)
    mm_win_f32/bf16    (512,W)@(W,128) expansion-shaped chain, W=1024

Run on the real chip:  python benchmarks/probe_tail.py
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    import jax
    if os.environ.get("GAT_TPU_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["GAT_TPU_PLATFORM"])
    import jax.numpy as jnp

    from gat_pytorch_tpu.data import datasets, loader
    from gat_pytorch_tpu.models import gat
    from gat_pytorch_tpu.train import optim as O
    from gat_pytorch_tpu.train.tasks import make_task
    from gat_pytorch_tpu.utils.config import get_config

    run_cfg = get_config("Cora")
    cfg = run_cfg.gat_config()
    raw = datasets.load_planetoid("Cora", seed=0)
    graph = loader.transductive_graph(raw)
    task = make_task("Cora")
    tx = O.adam_l2(run_cfg.learning_rate, run_cfg.l2_reg)
    params = gat.init_gat_model(jax.random.key(0), cfg)
    scan_len = int(os.environ.get("GAT_TPU_BENCH_SCAN", "100"))
    iters = int(os.environ.get("GAT_TPU_BENCH_ITERS", "5"))

    def timed(name, fn, *args, work_per_step=None):
        """fn: jitted (carry, *args) -> carry with a data dep on the work."""
        out = fn(*args)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        leaf = jax.tree_util.tree_leaves(out)[0]
        if jnp.issubdtype(leaf.dtype, jax.dtypes.prng_key):
            leaf = jax.random.key_data(leaf)
        float(np.asarray(leaf).ravel()[0])
        dt = (time.perf_counter() - t0) / (iters * scan_len)
        rec = {"stage": name, "us_per_step": round(dt * 1e6, 1)}
        if work_per_step:
            rec["tflops"] = round(work_per_step / dt / 1e12, 2)
        print(json.dumps(rec))
        return dt

    def scanned(body):
        @jax.jit
        def run(carry, *args):
            def step(c, _):
                return body(c, *args), None
            c, _ = jax.lax.scan(step, carry, None, length=scan_len)
            return c
        return run

    # --- scan/dispatch floor ------------------------------------------
    x0 = jnp.float32(1.0)
    timed("null", scanned(lambda c: c * 1.0000001), x0)
    timed("fold_only",
          scanned(lambda c: jax.random.fold_in(
              c, jnp.int32(0))), jax.random.key(0))

    # --- optimizer ----------------------------------------------------
    opt_state = tx.init(params)

    def adam_tree(carry):
        p, s = carry
        g = jax.tree_util.tree_map(lambda a: a * 1e-6, p)
        u, s = tx.update(g, s, p)
        p = jax.tree_util.tree_map(lambda a, b: a + b, p, u)
        return (p, s)

    timed("adam_tree", scanned(adam_tree), (params, opt_state))

    nparam = sum(int(np.prod(l.shape))
                 for l in jax.tree_util.tree_leaves(params))
    flat = jnp.zeros((nparam,), jnp.float32) + 1e-3
    fs = tx.init(flat)

    def adam_flat(carry):
        p, s = carry
        u, s = tx.update(p * 1e-6, s, p)
        return (p + u, s)

    timed(f"adam_flat_{nparam}", scanned(adam_flat), (flat, fs))

    # --- grad-only ----------------------------------------------------
    def loss_fn(p):
        logits = gat.gat_model_apply(p, cfg, graph, training=False)
        return task.loss(logits, graph, "train")

    def cora_grad(carry):
        p, acc = carry
        l, g = jax.value_and_grad(loss_fn)(p)
        p = jax.tree_util.tree_map(
            lambda a, b: a + 0.0 * b * l, p, g)
        return (p, acc + l)

    timed("cora_grad", scanned(cora_grad), (params, jnp.float32(0)))

    def cora_fwd(carry):
        p, acc = carry
        l = loss_fn(p)
        return (p, acc + l)

    timed("cora_fwd", scanned(cora_fwd), (params, jnp.float32(0)))

    # --- MXU rates ----------------------------------------------------
    def mm_chain(m, k, n, dtype):
        a = jnp.asarray(np.random.default_rng(0).normal(size=(m, k)),
                        dtype)
        b = jnp.asarray(np.random.default_rng(1).normal(size=(k, n)) /
                        np.sqrt(k), dtype)

        def body(c, _):
            # perturb a so the loop can't be hoisted; contract on MXU
            out = jax.lax.dot_general(
                a + c, b, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            return (out[0, 0] * 1e-6).astype(dtype), None

        @jax.jit
        def run(c):
            c, _ = jax.lax.scan(body, c, None, length=scan_len)
            return c
        return run, 2.0 * m * k * n

    for name, (m, k, n) in [("peak", (4096, 4096, 4096)),
                            ("win", (512, 1024, 128)),
                            ("win256", (512, 256, 128))]:
        for dt_ in ("float32", "bfloat16"):
            fn, flops = mm_chain(m, k, n, jnp.dtype(dt_))
            timed(f"mm_{name}_{dt_}", fn, jnp.zeros((), jnp.dtype(dt_)),
                  work_per_step=flops)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
