"""Benchmark: full training-step edge throughput on the flagship workload.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": "edges/s", "vs_baseline": N}

Workload: Cora-shaped 2-layer GAT (8 heads x 8, 1433-dim inputs — the
reference's headline config, run_config.py:78-84 shapes from SURVEY.md §6),
full train step (forward + backward + Adam update) jit-compiled, repeated
and timed with block_until_ready.

`vs_baseline`: the reference publishes no numbers (BASELINE.md), so the
baseline is the closest runnable equivalent of its approach — the SAME
training step implemented with plain XLA sorted segment ops
(backend="xla", the direct translation of the reference's
scatter_add/index_select pipeline), measured on this chip at 7.09M
edges/s (docs/PERF.md; re-measure with GAT_TPU_BACKEND=xla). A separate
`sol_fraction` key reports the HBM speed-of-light fraction from the
bytes/edge roofline model below.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np


def hbm_bandwidth_bytes_per_s() -> float:
    """Per-chip HBM bandwidth. Override with GAT_TPU_HBM_GBS."""
    env = os.environ.get("GAT_TPU_HBM_GBS")
    if env:
        return float(env) * 1e9
    import jax
    kind = jax.devices()[0].device_kind.lower()
    table = {  # GB/s, public spec sheets
        "v5 lite": 819.0, "v5litepod": 819.0, "v5e": 819.0,
        "v4": 1228.0, "v5p": 2765.0, "v6 lite": 1640.0, "v6e": 1640.0,
        "cpu": 50.0,
    }
    for k, v in table.items():
        if k in kind:
            return v * 1e9
    return 819.0


def roofline_edges_per_s(num_nodes: int, num_edges: int, cfg) -> float:
    """Speed-of-light edges/s for one train step of the model.

    Per-layer HBM traffic model (f32, E edges, N nodes, NH heads, F out
    features/head; node-level GEMM traffic amortises over E/N >= 4 edges
    per node and is included via the node terms):
      forward:  gather src features E*NH*F, scatter out E*NH*F,
                logits/alpha E*3*NH, node h read+write 2*N*NH*F
      backward: ~2x forward (re-read activations, write grads)
    """
    bw = hbm_bandwidth_bytes_per_s()
    total = 0.0
    heads = [1] + list(cfg.num_heads_per_layer)
    for i in range(cfg.num_layers):
        nh = heads[i + 1]
        f = cfg.head_output_features_per_layer[i + 1]
        per_edge = (2 * nh * f + 3 * nh) * 4
        per_node = (2 * nh * f) * 4
        total += num_edges * per_edge + num_nodes * per_node
    total *= 3.0  # fwd + ~2x bwd
    seconds_per_step = total / bw
    return cfg.num_layers * num_edges / seconds_per_step


def main() -> None:
    import jax

    from gat_pytorch_tpu.data import datasets, loader
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
    rng = jax.random.key(0)
    params_rng, rng = jax.random.split(rng)
    from gat_pytorch_tpu.models.gat import init_gat_model
    params = init_gat_model(params_rng, cfg)
    state = TrainState(params=params, opt_state=tx.init(params), rng=rng,
                       step=jax.numpy.int32(0))

    # scan a block of train steps on-device (the production transductive
    # path, Trainer.fit_compiled) so dispatch overhead amortises
    inner = int(os.environ.get("GAT_TPU_BENCH_INNER", "100"))
    step = make_train_step(cfg, task, tx, jit=False)

    @jax.jit
    def block(state, graph):
        def body(s, _):
            s, mets = step(s, graph)
            return s, mets["train_loss"]
        return jax.lax.scan(body, state, None, length=inner)

    state, losses = block(state, graph)   # compile + warmup
    float(np.asarray(losses)[-1])

    iters = int(os.environ.get("GAT_TPU_BENCH_ITERS", "5"))
    t0 = time.perf_counter()
    for _ in range(iters):
        state, losses = block(state, graph)
    # force a host transfer of a value that depends on every step: on the
    # tunneled backend block_until_ready has been observed to return
    # before remote execution finishes, inflating throughput ~1000x
    float(np.asarray(losses)[-1])
    dt = time.perf_counter() - t0

    e_real = int(np.asarray(graph.edge_mask).sum())
    edges_per_s = cfg.num_layers * e_real * iters * inner / dt
    sol = roofline_edges_per_s(int(np.asarray(graph.node_mask).sum()),
                               e_real, cfg)
    # measured XLA-segment-ops equivalent of the reference pipeline on
    # this chip (docs/PERF.md); override after re-measuring
    xla_baseline = float(os.environ.get("GAT_TPU_XLA_BASELINE", "7.09e6"))
    print(json.dumps({
        "metric": "cora_train_step_edge_throughput",
        "value": round(edges_per_s, 1),
        "unit": "edges/s",
        "vs_baseline": round(edges_per_s / xla_baseline, 4),
        "sol_fraction": round(edges_per_s / sol, 4),
    }))


if __name__ == "__main__":
    main()
