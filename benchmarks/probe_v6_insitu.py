"""Bisect the v6 in-situ Cora regression: the op-level A/B
(window_bench) showed v6 >= v5 at Cora shapes WITHOUT dropout, but the
full bench train step measured 27.0M (v6 auto) vs 45.9M (v5) edges/s —
Cora trains with attention dropout 0.6, which window_bench never
exercised. This times the scanned train step over
{GAT_TPU_V6 0/1} x {dropout 0.0/0.6} in ONE process (the env gate is
read at trace time, so toggling os.environ between jit builds is a
clean A/B on the same chip session).
"""

from __future__ import annotations

import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(__file__)))

import bench  # noqa: E402


def main() -> None:
    inner = int(os.environ.get("GAT_TPU_BENCH_INNER", "100"))
    iters = int(os.environ.get("GAT_TPU_BENCH_ITERS", "3"))
    cfg, graph, task, lr, l2 = bench.cora_workload()
    import numpy as np
    e_real = int(np.asarray(graph.edge_mask).sum())
    env_cases = os.environ.get(
        "GAT_TPU_PROBE_CASES",
        "0:0.0:1:1,0:0.6:0:1,0:0.6:1:1,auto:0.6:1:1,1:0.0:1:1")
    cases = [tuple(c.split(":")) for c in env_cases.split(",")]
    for case in cases:
        v6, dropout, rbg = case[0], float(case[1]), case[2]
        merged = case[3] if len(case) > 3 else "1"
        gemm = case[4] if len(case) > 4 else "float32"
        remat = case[5] if len(case) > 5 else "1"
        os.environ["GAT_TPU_V6"] = v6
        os.environ["GAT_TPU_RBG_DROPOUT"] = rbg
        os.environ["GAT_TPU_V5_MERGED"] = merged
        os.environ["GAT_TPU_GEMM_DTYPE"] = gemm
        os.environ["GAT_TPU_REMAT_DROPOUT"] = remat
        g = graph
        if gemm == "bfloat16":
            # bf16 AT REST: cast the feature matrix once outside the
            # step so the hot loop pays no f32->bf16 convert pass
            import dataclasses as dc
            import jax.numpy as jnp
            g = dc.replace(graph, x=graph.x.astype(jnp.bfloat16))
        c = dataclasses.replace(cfg, dropout=dropout)
        dt = bench.measure_train_step(c, g, task, lr, l2,
                                      inner, iters)
        print(json.dumps({
            "v6": v6, "dropout": dropout, "rbg": rbg, "merged": merged,
            "gemm": gemm, "remat": remat,
            "ms_per_step": round(dt * 1e3, 4),
            "edges_per_s": round(c.num_layers * e_real / dt, 1),
        }), flush=True)


if __name__ == "__main__":
    main()
