"""A/B the v7 block-layout sizes (GAT_TPU_V7_EB/NB) on the banded
5M-edge train step: the layout is built per case (env read at
canonicalize time), so each case pays one compile.

    python benchmarks/probe_v7_blocks.py
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
    cases = os.environ.get("GAT_TPU_PROBE_CASES",
                           "512:256,256:256,256:128,1024:256")
    import numpy as np
    for case in cases.split(","):
        eb, nb = case.split(":")
        os.environ["GAT_TPU_V7_EB"] = eb
        os.environ["GAT_TPU_V7_NB"] = nb
        cfg, graph, task, lr, l2 = bench.banded_workload()
        bl = graph.block_layout
        e_real = int(np.asarray(graph.edge_mask).sum())
        dt = bench.measure_train_step(cfg, graph, task, lr, l2,
                                      inner, iters)
        print(json.dumps({
            "eb": int(eb), "nb": int(nb), "wb": bl.wb,
            "window": bl.window, "slots": bl.num_slots,
            "ms_per_step": round(dt * 1e3, 4),
            "edges_per_s": round(cfg.num_layers * e_real / dt, 1),
        }), flush=True)


if __name__ == "__main__":
    main()
