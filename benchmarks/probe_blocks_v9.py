"""v7 block-size re-sweep at v9 (global meta/raw streams).

The round-4 sweep (probe_v7_blocks.py, PERF.md) that picked
eb=1024/nb=512 ran PRE-v9: per-block/per-tile DMA bootstrap+drain
stalls then dominated small blocks (256x256 measured 58.1M vs 95.1M).
v9 made the streams global (one exposed latency per kernel instead of
per tile), so the per-block fixed costs it was trading against are
gone — while the one-hot construction + contraction work, the largest
remaining banded cost (~30 ms of 87), scales with slots*(nb+wb):
6.14G at 1024/512 vs 2.93G at 256/256 (host-modeled). Unlike
probe_v7_blocks this rebuilds the LAYOUT per case (the env knobs are
read at canonicalize time).

    GAT_TPU_PROBE_WL=banded GAT_TPU_PROBE_BLOCKS="1024:512,512:512" \
        python benchmarks/probe_blocks_v9.py
"""

from __future__ import annotations

import importlib
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(__file__)))


def main() -> None:
    wl = os.environ.get("GAT_TPU_PROBE_WL", "banded")
    cases = os.environ.get(
        "GAT_TPU_PROBE_BLOCKS",
        "1024:512,512:512,384:384,256:256").split(",")
    inner = int(os.environ.get(
        "GAT_TPU_BENCH_INNER", "10" if wl == "banded" else "400"))
    iters = int(os.environ.get("GAT_TPU_BENCH_ITERS", "3"))
    import numpy as np
    for case in cases:
        eb, _, nb = case.partition(":")
        os.environ["GAT_TPU_V7_EB"] = eb
        os.environ["GAT_TPU_V7_NB"] = nb
        import bench
        importlib.reload(bench)   # workload/layout rebuilt under the env
        cfg, graph, task, lr, l2 = (bench.banded_workload() if wl == "banded"
                                    else bench.cora_workload())
        bl = graph.block_layout
        e_real = int(np.asarray(graph.edge_mask).sum())
        try:
            dt = bench.measure_train_step(cfg, graph, task, lr, l2,
                                          inner, iters)
        except Exception as exc:  # e.g. VMEM OOM at large eb — keep going
            print(json.dumps({"wl": wl, "eb": int(eb), "nb": int(nb),
                              "error": str(exc)[:200]}), flush=True)
            continue
        print(json.dumps({
            "wl": wl, "eb": int(eb), "nb": int(nb), "wb": int(bl.wb),
            "slots": int(bl.send.shape[0]),
            "ms_per_step": round(dt * 1e3, 4),
            "edges_per_s": round(cfg.num_layers * e_real / dt, 1),
        }), flush=True)


if __name__ == "__main__":
    main()
