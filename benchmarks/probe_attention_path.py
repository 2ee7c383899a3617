"""Attention-returning train step A/B (VERDICT r3 item 5): with
attention_reward/penalty != 0 the loss consumes alpha, which used to
force the FULL XLA fallback. Round 4 routes the aggregation through the
v4 fused table kernel while alpha rides cheap (E, NH) XLA segment ops.

Times the lambda=1.0 PPI-shaped train step (reference ppi_gat.py:25-32
sweep) for backend xla (the old fallback) vs pallas (the new path).

    python benchmarks/probe_attention_path.py --nodes 100000 --deg 10
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--nodes", type=int, default=100_000)
    ap.add_argument("--deg", type=int, default=10)
    ap.add_argument("--features", type=int, default=50)
    ap.add_argument("--banded", type=int, default=0,
                    help="banded senders (windowed-kernel-eligible "
                         "graph, canonicalised with src_windows) — the "
                         "round-5 lambda A/B: v7+alpha-replica vs the "
                         "round-4 v4+XLA-alpha path (GAT_TPU_V6=0) vs "
                         "the full XLA fallback")
    args = ap.parse_args()

    from gat_pytorch_tpu.graph import transforms as T
    from gat_pytorch_tpu.models.gat import GATConfig
    from gat_pytorch_tpu.train.tasks import make_task

    rng = np.random.default_rng(0)
    n, e = args.nodes, args.nodes * args.deg
    if args.banded:
        receivers = rng.integers(0, n, e)
        senders = np.clip(
            receivers + rng.integers(-args.banded // 2,
                                     args.banded // 2, e), 0, n - 1)
    else:
        senders = rng.integers(0, n, e)
        receivers = rng.integers(0, n, e)
    x = rng.normal(size=(n, args.features)).astype(np.float32)
    y = (rng.random((n, 8)) > 0.5).astype(np.float32)
    graph = T.canonicalize(x, senders, receivers, y=y,
                           src_windows=bool(args.banded))
    # PPI-flavoured shape at benchable scale
    cfg = GATConfig(
        num_input_node_features=args.features, num_layers=2,
        num_heads_per_layer=[8, 8], heads_concat_per_layer=[True, False],
        head_output_features_per_layer=[args.features, 16, 8],
        num_classes=8, add_skip_connection=[False, False], dropout=0.0)
    task = make_task("PPI", attention_penalty=1.0)
    e_real = int(np.asarray(graph.edge_mask).sum())
    inner = int(os.environ.get("GAT_TPU_BENCH_INNER", "20"))
    iters = int(os.environ.get("GAT_TPU_BENCH_ITERS", "3"))

    cases = [("xla", None), ("pallas", None)]
    if args.banded:
        # v4+XLA-alpha (the round-4 lambda path) vs v7+alpha-replica
        cases = [("xla", None), ("pallas_v4", "off"), ("pallas", None)]
    for backend, v6 in cases:
        os.environ["GAT_TPU_BACKEND"] = backend.split("_")[0]
        if v6 is None:
            os.environ.pop("GAT_TPU_V6", None)
            os.environ.pop("GAT_TPU_V5", None)
        else:
            os.environ["GAT_TPU_V6"] = v6
            os.environ["GAT_TPU_V5"] = v6
        dt = bench.measure_train_step(cfg, graph, task, 1e-3, 0.0,
                                      inner, iters)
        print(json.dumps({
            "case": f"lambda1_{backend}",
            "ms_per_step": round(dt * 1e3, 4),
            "edges_per_s": round(cfg.num_layers * e_real / dt, 1),
        }), flush=True)
    os.environ.pop("GAT_TPU_BACKEND", None)


if __name__ == "__main__":
    main()
