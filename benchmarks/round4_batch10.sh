#!/bin/bash
# Round-4 batch 10: clustered-5M hybrid A/B + XLA baseline retry.
cd /root/repo
export GAT_TPU_GEMM_DTYPE=bfloat16
echo "=== clustered 5M: hybrid(auto, eb 256) vs hybrid(eb 1024) vs v5(0) ==="
GAT_TPU_CLUSTERED_CASES="auto,auto/1024,0" timeout 5400 \
  python benchmarks/probe_clustered.py
echo "=== XLA baseline retry (shorter scan) ==="
unset GAT_TPU_GEMM_DTYPE
GAT_TPU_BENCH_INNER=100 GAT_TPU_BENCH_ITERS=3 timeout 1800 \
  python bench.py --measure_baseline
echo "=== batch 10 done ==="
