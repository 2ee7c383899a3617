"""Isolate banded-workload regressions: time the banded 5M-edge train
step across {GAT_TPU_V6 auto/0/1} x {fwd-only / full step} in one
process (env gates read at trace time).

    GAT_TPU_PROBE_CASES="auto,0,1" python benchmarks/probe_banded.py
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
    cfg, graph, task, lr, l2 = bench.banded_workload()
    import numpy as np
    e_real = int(np.asarray(graph.edge_mask).sum())
    # case syntax: "<v6>[/<ablate-tokens>]" — e.g. "auto/onehot+gather"
    # sets GAT_TPU_V7_ABLATE=onehot,gather (profiling-only: results are
    # WRONG under ablation; only the timing delta is meaningful)
    for case in os.environ.get("GAT_TPU_PROBE_CASES", "auto,0").split(","):
        parts = case.split("/")
        v6 = parts[0]
        abl = parts[1] if len(parts) > 1 else ""
        v10 = parts[2] if len(parts) > 2 else "1"
        v11 = parts[3] if len(parts) > 3 else "1"
        os.environ["GAT_TPU_V6"] = v6
        os.environ["GAT_TPU_V7_ABLATE"] = abl.replace("+", ",")
        os.environ["GAT_TPU_V10"] = v10
        os.environ["GAT_TPU_V11"] = v11
        dt = bench.measure_train_step(cfg, graph, task, lr, l2,
                                      inner, iters)
        print(json.dumps({
            "v6": v6, "ablate": abl, "v10": v10, "v11": v11,
            "ms_per_step": round(dt * 1e3, 4),
            "edges_per_s": round(cfg.num_layers * e_real / dt, 1),
        }), flush=True)


if __name__ == "__main__":
    main()
