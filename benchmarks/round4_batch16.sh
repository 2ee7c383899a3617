#!/bin/bash
cd /root/repo
export GAT_TPU_GEMM_DTYPE=bfloat16
GAT_TPU_CLUSTERED_CASES="auto" timeout 2700 python benchmarks/probe_clustered.py
echo "=== batch 16 done ==="
