"""Pubmed workload A/B: the round-3 v5 path (RCM reorder — SBM doesn't
band, windowed kernels never engage) vs the round-4 hybrid
split-locality path (cluster reorder + v7 local / v5 remainder).

    GAT_TPU_PUBMED_CASES="rcm,cluster,cluster@128" \
        python benchmarks/probe_pubmed.py
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(__file__)))

import bench  # noqa: E402


def main() -> None:
    inner = int(os.environ.get("GAT_TPU_BENCH_INNER", "100"))
    iters = int(os.environ.get("GAT_TPU_BENCH_ITERS", "3"))
    import numpy as np
    cases = os.environ.get("GAT_TPU_PUBMED_CASES",
                           "rcm,cluster").split(",")
    for case in cases:
        # case syntax: <reorder>[@<hybrid_eb>][/<v6>][/nodrop]
        parts = case.split("/")
        v6 = parts[1] if len(parts) > 1 and parts[1] else "auto"
        nodrop = "nodrop" in parts[2:]
        head = parts[0]
        if "@" in head:
            reorder, heb = head.split("@")
            os.environ["GAT_TPU_V7_HYBRID_EB"] = heb
        else:
            reorder = head
            os.environ.pop("GAT_TPU_V7_HYBRID_EB", None)
        os.environ["GAT_TPU_PUBMED_REORDER"] = reorder
        os.environ["GAT_TPU_V6"] = v6
        cfg, graph, task, lr, l2 = bench.pubmed_workload()
        if nodrop:
            import dataclasses
            cfg = dataclasses.replace(cfg, dropout=0.0)
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
            "ms_per_step": round(dt * 1e3, 4),
            "edges_per_s": round(cfg.num_layers * e_real / dt, 1),
        }), flush=True)


if __name__ == "__main__":
    main()
