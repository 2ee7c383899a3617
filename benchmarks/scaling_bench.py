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


def project(argv_ns) -> int:
    """ICI-roofline scaling projection from measured quantities.

    Multi-chip hardware is absent in this container (SURVEY §5.8 /
    BASELINE north star: >=70% edges/s scaling efficiency on a 2-host
    slice), so this computes the projected efficiency analytically from
    two MEASURED inputs: the single-chip step time (--t1_ms, e.g.
    bench.py's 5M-edge step) and the per-chip collective bytes the
    compiled sharded program moves (HLO-counted by the --simulate run;
    for the dst-owner layout that is one all_gather of (N, nh*f) output
    slices per layer forward + its reduce_scatter transpose backward).

        efficiency(K) = T1/K / (T1/K + comm_bytes(K) / BW)

    BW defaults: --ici_gbs 90 (v5e ~1600 Gbit/s/chip aggregate across
    links; ~90 GB/s usable unidirectional ring bandwidth is the
    conservative public planning number), --dcn_gbs 25 per host for the
    2-host case (inter-host fraction of the ring crosses DCN)."""
    t1 = argv_ns.t1_ms * 1e-3
    n = argv_ns.nodes
    # per-LAYER output widths after head combine (round-4 fix: the old
    # model charged every layer at the widest nhf — the bench model's
    # layer 2 is mean-combined to 8 wide, 16x less than layer 1)
    widths_out = argv_ns.layer_widths
    ag_bytes = 2 if argv_ns.bf16_transport else 4
    rows = []
    for k in argv_ns.widths:
        # per-chip received bytes per step: fwd all_gather + bwd
        # reduce_scatter per layer over that layer's output width; with
        # bf16 transport (GAT_TPU_AG_DTYPE=bfloat16) BOTH directions run
        # at 2 B/elem (the cast's transpose makes the cotangent bf16)
        bytes_per_chip = sum(2 * (k - 1) / k * n * w * ag_bytes
                             for w in widths_out)
        bw = argv_ns.ici_gbs * 1e9
        mode = "edge_ici"
        if argv_ns.hosts > 1 and argv_ns.dp_across_hosts:
            # production 2-host shape: mesh (data=hosts, edge=K) — the
            # edge-axis all_gathers stay on ICI within each host and the
            # only DCN traffic is the gradient psum (~param bytes,
            # negligible next to the activations). Per-chip throughput
            # therefore matches the single-host edge=K row while total
            # throughput multiplies by hosts.
            mode = "dp_hosts_x_edge_ici"
            t_comm = (bytes_per_chip / bw
                      + argv_ns.grad_mb * 2**20
                      / (argv_ns.dcn_gbs * 1e9))
        elif argv_ns.hosts > 1:
            # naive edge axis spanning hosts: the ring slice crossing
            # DCN throttles — kept as the counter-example
            mode = "edge_spanning_dcn"
            t_comm = (bytes_per_chip * (1 - 1 / argv_ns.hosts) / bw
                      + bytes_per_chip / argv_ns.hosts
                      / (argv_ns.dcn_gbs * 1e9))
        else:
            t_comm = bytes_per_chip / bw
        t_k = t1 / k + t_comm
        rows.append({
            "projected": True, "mode": mode, "edge_axis": k,
            "hosts": argv_ns.hosts, "t1_ms": argv_ns.t1_ms,
            "comm_mb_per_chip": round(bytes_per_chip / 2**20, 2),
            "ms_per_step": round(t_k * 1e3, 3),
            "scaling_efficiency": round((t1 / k) / t_k, 4),
        })
    for r in rows:
        print(json.dumps(r), flush=True)
    return 0


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
    p.add_argument("--windowed", action="store_true",
                   help="dst_owned with per-shard v7 block layouts "
                        "(src_windows=True — the round-4 sharded "
                        "windowed kernels)")
    p.add_argument("--project", action="store_true",
                   help="print the analytic ICI scaling projection "
                        "instead of running (see project.__doc__)")
    p.add_argument("--t1_ms", type=float, default=70.87,
                   help="measured single-chip ms/step of the SHARDED "
                        "program (round-4: sharded_tpu_check --dst_owned "
                        "--windowed --bench_model banded-5M, 1-device "
                        "mesh — docs/PERF.md round 4)")
    p.add_argument("--layer_widths", type=int, nargs="+",
                   default=[128, 8],
                   help="per-layer output widths after head combine "
                        "(bench model: 8x16 concat, 8x8 mean)")
    p.add_argument("--bf16_transport", action="store_true",
                   help="model GAT_TPU_AG_DTYPE=bfloat16 (2 B/elem both "
                        "directions)")
    p.add_argument("--widths", type=int, nargs="+",
                   default=[2, 4, 8, 16])
    p.add_argument("--hosts", type=int, default=1)
    p.add_argument("--dp_across_hosts", action="store_true",
                   help="2-host shape: DP over DCN x edge over ICI")
    p.add_argument("--grad_mb", type=float, default=0.2,
                   help="parameter-gradient MB for the DCN psum")
    p.add_argument("--ici_gbs", type=float, default=90.0)
    p.add_argument("--dcn_gbs", type=float, default=25.0)
    args = p.parse_args(argv)
    if args.project:
        if args.nodes == 4096:
            args.nodes = 500_000   # default projection target: bench 5M
        return project(args)

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
            # dtype-aware (bf16 transport counts 2 B/elem): f32[...],
            # bf16[...], s32[...], pred[...]
            for tm in _re.finditer(r"\b(f|bf|s|u|pred)(\d*)\[([\d,]*)\]",
                                   mm.group(1)):
                bits = int(tm.group(2)) if tm.group(2) else 8
                s = 1
                for d in tm.group(3).split(","):
                    if d:
                        s *= int(d)
                total += (bits // 8) * s
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
            g, _ = parallel.partition_edges_by_dst(
                graph, w, src_windows=args.windowed)
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
