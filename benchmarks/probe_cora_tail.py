"""Cora launch-tail accounting (VERDICT r4 item 5).

The round-4 closing profile put ~57 us of the 204.7 us Cora device step
in fixed/launch cost; the named lever is merging kernel launches (a
resident-table two-layer program). Before building a mega-kernel, this
probe bounds what it could buy: the full train step is timed with the
kernels' INNER work ablated away (GAT_TPU_V7_ABLATE — results wrong,
timing meaningful), leaving launches + grid + DMA + every XLA op.

  base       unablated step (the official Cora line's step)
  inner_off  cap,onehot,scores,gather,scatter,payload,exp,expander,
             accdot ablated: kernels reduced to launch+grid+streams
  dma_off    inner_off + dmam,dmaw,winT: kernels reduced to ~pure
             launch+grid

  mega-kernel ceiling ~= base - 0.75*(base - dma_off_kernel_share):
  a fused two-layer program still does all inner work and one launch.

    python benchmarks/probe_cora_tail.py
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402


def main() -> None:
    inner = int(os.environ.get("GAT_TPU_BENCH_INNER", "400"))
    iters = int(os.environ.get("GAT_TPU_BENCH_ITERS", "3"))
    os.environ.setdefault("GAT_TPU_GEMM_DTYPE", "bfloat16")
    cfg, graph, task, lr, l2 = bench.cora_workload()
    e_real = int(np.asarray(graph.edge_mask).sum())

    cases = {
        "base": "",
        "inner_off": ("cap,onehot,scores,gather,scatter,payload,"
                      "exp,expander,accdot"),
        "dma_off": ("cap,onehot,scores,gather,scatter,payload,"
                    "exp,expander,accdot,dmam,dmaw,winT"),
    }
    out = {"probe": "cora_tail", "edges": e_real, "inner": inner}
    for name, abl in cases.items():
        os.environ["GAT_TPU_V7_ABLATE"] = abl
        dt = bench.measure_train_step(cfg, graph, task, lr, l2,
                                      inner, iters)
        out[f"{name}_us_per_step"] = round(dt * 1e6, 1)
        out[f"{name}_edges_per_s"] = round(cfg.num_layers * e_real / dt)
        print(json.dumps({name: out[f"{name}_us_per_step"]}), flush=True)
    os.environ.pop("GAT_TPU_V7_ABLATE", None)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
