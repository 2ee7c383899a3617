"""Cora-scale step bisection: where does the 1.1 ms/step go?

The round-1 device profile showed ~0.85 ms/step of small-XLA-fusion tail
at Cora scale (docs/PERF.md). This script times nested sub-programs of
the train step, each scanned GAT_TPU_BENCH_SCAN times inside one
dispatch, to locate the tail after the round-2 table-op rewrite:

    stages: full train step | fwd+loss only | model fwd only |
            layer-1 only | layer-1 prep only (logits, no kernel) |
            adam update only

    python benchmarks/cora_bisect.py
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    import jax
    if os.environ.get("GAT_TPU_PLATFORM"):
        # env JAX_PLATFORMS alone does not stick here (CLAUDE.md)
        jax.config.update("jax_platforms", os.environ["GAT_TPU_PLATFORM"])
    import jax.numpy as jnp

    from gat_pytorch_tpu.data import datasets, loader
    from gat_pytorch_tpu.models import gat
    from gat_pytorch_tpu.train import optim as O
    from gat_pytorch_tpu.train.tasks import make_task
    from gat_pytorch_tpu.train.trainer import TrainState, make_train_step
    from gat_pytorch_tpu.utils.config import get_config

    run_cfg = get_config("Cora")
    cfg = run_cfg.gat_config()
    raw = datasets.load_planetoid("Cora", seed=0)
    graph = loader.transductive_graph(raw)
    task = make_task("Cora")
    tx = O.adam_l2(run_cfg.learning_rate, run_cfg.l2_reg)
    params = gat.init_gat_model(jax.random.key(0), cfg)
    state = TrainState(params=params, opt_state=tx.init(params),
                       rng=jax.random.key(1), step=jnp.int32(0))
    scan_len = int(os.environ.get("GAT_TPU_BENCH_SCAN", "50"))
    layer_cfgs = cfg.layer_configs()

    def scanned(body):
        @jax.jit
        def run(state, graph):
            def step(carry, _):
                out = body(carry, graph)
                return out, None
            carry, _ = jax.lax.scan(step, state, None, length=scan_len)
            return carry
        return run

    step_fn = make_train_step(cfg, task, tx, jit=False)

    def full_step(carry, graph):
        s, _ = step_fn(carry, graph)
        return s

    def fwd_loss(carry, graph):
        logits = gat.gat_model_apply(carry.params, cfg, graph,
                                     training=False)
        loss = task.loss(logits, graph, "train")
        # thread the loss back through the rng so the scan has a carry dep
        rng = jax.random.fold_in(carry.rng, (loss * 0).astype(jnp.int32))
        return TrainState(params=carry.params, opt_state=carry.opt_state,
                          rng=rng, step=carry.step)

    def model_fwd(carry, graph):
        out = gat.gat_model_apply(carry.params, cfg, graph, training=False)
        rng = jax.random.fold_in(carry.rng,
                                 (jnp.sum(out) * 0).astype(jnp.int32))
        return TrainState(params=carry.params, opt_state=carry.opt_state,
                          rng=rng, step=carry.step)

    def layer1(carry, graph):
        out = gat.gat_layer_apply(
            carry.params["layers"][0], layer_cfgs[0], graph.x,
            graph.senders, graph.receivers, graph.edge_mask,
            graph.num_nodes, src_order=graph.src_order)
        rng = jax.random.fold_in(carry.rng,
                                 (jnp.sum(out) * 0).astype(jnp.int32))
        return TrainState(params=carry.params, opt_state=carry.opt_state,
                          rng=rng, step=carry.step)

    def layer1_logits(carry, graph):
        p = carry.params["layers"][0]
        h_flat = jnp.dot(graph.x, p["W"],
                         preferred_element_type=jnp.float32)
        nh = layer_cfgs[0].num_heads
        f = layer_cfgs[0].out_features
        a_src, a_dst = gat._split_attention_map(p["a"], nh, f)
        s_src = jnp.dot(h_flat, a_src, preferred_element_type=jnp.float32)
        s_dst = jnp.dot(h_flat, a_dst, preferred_element_type=jnp.float32)
        from gat_pytorch_tpu.ops import segment as seg
        logits = (seg.gather_rows(s_src, graph.senders)
                  + seg.gather_rows(s_dst, graph.receivers))
        masked = jnp.where(graph.edge_mask[:, None], logits, -jnp.inf)
        cap = jnp.max(masked)
        logits = jax.nn.leaky_relu(logits - cap, 0.01)
        rng = jax.random.fold_in(carry.rng,
                                 (jnp.sum(logits) * 0).astype(jnp.int32))
        return TrainState(params=carry.params, opt_state=carry.opt_state,
                          rng=rng, step=carry.step)

    def adam_only(carry, graph):
        grads = jax.tree_util.tree_map(jnp.ones_like, carry.params)
        updates, opt_state = tx.update(grads, carry.opt_state,
                                       carry.params)
        params = jax.tree_util.tree_map(lambda a, b: a + b, carry.params,
                                        updates)
        return TrainState(params=params, opt_state=opt_state,
                          rng=carry.rng, step=carry.step + 1)

    stages = [("full_step", full_step), ("fwd_loss", fwd_loss),
              ("model_fwd", model_fwd), ("layer1", layer1),
              ("layer1_logits", layer1_logits), ("adam_only", adam_only)]
    for name, body in stages:
        fn = scanned(body)
        out = fn(state, graph)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        iters = 5
        for _ in range(iters):
            out = fn(state, graph)
        # sync on BOTH carry channels: fwd stages thread the work through
        # rng, the optimizer stage through params
        float(np.asarray(jax.random.key_data(out.rng)).ravel()[0])
        float(np.asarray(
            jax.tree_util.tree_leaves(out.params)[0]).ravel()[0])
        dt = (time.perf_counter() - t0) / (iters * scan_len)
        print(json.dumps({"stage": name, "us_per_step":
                          round(dt * 1e6, 1)}), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
