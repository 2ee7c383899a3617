"""Clustered (SBM) 5M-edge workload A/B: v5 table path vs the hybrid
split-locality path — the scale where removed crossings should dominate
the split's fixed costs (bench.clustered_workload).

    GAT_TPU_CLUSTERED_CASES="auto,0" python benchmarks/probe_clustered.py
"""
from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(__file__)))

import bench  # noqa: E402


def main() -> None:
    inner = int(os.environ.get("GAT_TPU_BENCH_INNER", "10"))
    iters = int(os.environ.get("GAT_TPU_BENCH_ITERS", "3"))
    import numpy as np
    for case in os.environ.get("GAT_TPU_CLUSTERED_CASES",
                               "auto,0").split(","):
        parts = case.split("/")
        os.environ["GAT_TPU_V6"] = parts[0]
        if len(parts) > 1 and parts[1]:
            os.environ["GAT_TPU_V7_HYBRID_EB"] = parts[1]
        else:
            os.environ.pop("GAT_TPU_V7_HYBRID_EB", None)
        cfg, graph, task, lr, l2 = bench.clustered_workload()
        e_real = int(np.asarray(graph.edge_mask).sum())
        bl = graph.block_layout
        stats = None
        if bl is not None:
            stats = {"slots": int(bl.send.shape[0]), "wb": bl.wb,
                     "window": bl.window, "eb": bl.eb, "dmax": bl.dmax,
                     "rem": bl.rem_e if bl.rem_send is not None else None}
        dt = bench.measure_train_step(cfg, graph, task, lr, l2,
                                      inner, iters)
        print(json.dumps({
            "case": case, "layout": stats,
            "ms_per_step": round(dt * 1e3, 3),
            "edges_per_s": round(cfg.num_layers * e_real / dt, 1),
        }), flush=True)


if __name__ == "__main__":
    main()
