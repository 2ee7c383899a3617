#!/bin/bash
# Round-4 batch 11: clustered A/B completion (hybrid vs v5, one session).
cd /root/repo
export GAT_TPU_GEMM_DTYPE=bfloat16
GAT_TPU_CLUSTERED_CASES="auto,0" timeout 5400 \
  python benchmarks/probe_clustered.py
echo "=== batch 11 done ==="
