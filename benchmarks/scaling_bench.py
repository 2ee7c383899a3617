"""Edge-partition scaling benchmark over a device mesh.

Measures the sharded SPMD train step (parallel/train.py) at increasing
edge-axis widths and reports scaling efficiency — the SURVEY §7.8
"1 chip -> 1 host -> N hosts" protocol. On real multi-chip hardware it
measures true ICI scaling; on a single-chip/CPU environment pass
--simulate N to run the identical SPMD program on N virtual CPU devices
(validates the program and the communication structure, NOT real
bandwidth — the output labels which mode ran).

    python benchmarks/scaling_bench.py --simulate 8
    python benchmarks/scaling_bench.py            # real devices
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--simulate", type=int, default=None,
                   help="N virtual CPU devices instead of real chips")
    p.add_argument("--nodes", type=int, default=4096)
    p.add_argument("--avg_degree", type=int, default=16)
    p.add_argument("--features", type=int, default=64)
    p.add_argument("--steps", type=int, default=10)
    p.add_argument("--layout", default="cut",
                   choices=["cut", "dst_owned"],
                   help="cut: equal edge slices + psum completion; "
                        "dst_owned: boundary-free partition, one "
                        "all_gather/layer (parallel/partition.py)")
    args = p.parse_args(argv)

    if args.simulate:
        os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    if args.simulate:
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_num_cpu_devices", args.simulate)
    import jax.numpy as jnp

    from gat_pytorch_tpu import GATConfig, parallel
    from gat_pytorch_tpu.data.synthetic import make_random_graph
    from gat_pytorch_tpu.graph import transforms as T
    from gat_pytorch_tpu.train import optim as O
    from gat_pytorch_tpu.train.tasks import make_task
    from gat_pytorch_tpu.train.trainer import TrainState

    raw = make_random_graph(0, args.nodes, args.avg_degree, args.features)
    y = (np.random.default_rng(1).random((args.nodes, 8)) > 0.5
         ).astype(np.float32)
    graph = T.canonicalize(raw.x, raw.senders, raw.receivers, y=y)
    cfg = GATConfig(
        num_input_node_features=args.features, num_layers=2,
        num_heads_per_layer=[4, 4], heads_concat_per_layer=[True, False],
        head_output_features_per_layer=[args.features, 32, 8],
        num_classes=8, add_skip_connection=[False, False], dropout=0.0)
    task = make_task("PPI")
    tx = O.adam_l2(1e-3)
    e_real = int(np.asarray(graph.edge_mask).sum())

    import re as _re

    def collective_bytes(compiled_text: str) -> int:
        total = 0
        for ln in compiled_text.splitlines():
            mm = _re.search(r"= (.*?) (?:all-reduce|all-gather|"
                            r"reduce-scatter|all-to-all)\(", ln)
            if not mm:
                continue
            for tm in _re.finditer(r"[fsu]\d+\[([\d,]*)\]", mm.group(1)):
                s = 1
                for d in tm.group(1).split(","):
                    if d:
                        s *= int(d)
                total += 4 * s
        return total

    n_total = len(jax.devices())
    widths = [w for w in (1, 2, 4, 8, 16, 32) if w <= n_total]
    base = None
    dst_owned = args.layout == "dst_owned"
    for w in widths:
        mesh = parallel.make_mesh(data=1, edge=w,
                                  devices=jax.devices()[:w])
        g = graph
        if dst_owned:
            g, _ = parallel.partition_edges_by_dst(graph, w)
        batch = parallel.put_batch(parallel.stack_graphs([g]), mesh)
        params_key, rng = jax.random.split(jax.random.key(0))
        from gat_pytorch_tpu.models.gat import init_gat_model
        params = init_gat_model(params_key, cfg)
        state = parallel.replicated(
            TrainState(params=params, opt_state=tx.init(params), rng=rng,
                       step=jnp.int32(0)), mesh)
        step = parallel.make_sharded_train_step(cfg, task, tx, mesh,
                                                dst_owned=dst_owned)
        comm = collective_bytes(
            jax.jit(step).lower(state, batch).compile().as_text())
        state, mets = step(state, batch)
        float(np.asarray(mets["train_loss"]))
        t0 = time.perf_counter()
        for _ in range(args.steps):
            state, mets = step(state, batch)
        float(np.asarray(mets["train_loss"]))
        dt = (time.perf_counter() - t0) / args.steps
        eps = 2 * e_real / dt
        if base is None:
            base = eps
        print(json.dumps({
            "edge_axis": w,
            "layout": args.layout,
            "mode": "simulated-cpu" if args.simulate else
            jax.devices()[0].platform,
            "ms_per_step": round(dt * 1e3, 3),
            "edges_per_s": round(eps, 1),
            "scaling_efficiency": round(eps / (base * w), 4),
            "collective_bytes_per_step": comm,
        }), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
