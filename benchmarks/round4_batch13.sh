#!/bin/bash
# Round-4 batch 13: Pubmed + Cora ablation lever maps at the v12 kernels
# (round-5 planning data; ablated results are WRONG, only deltas count).
cd /root/repo
export GAT_TPU_GEMM_DTYPE=bfloat16
echo "=== Pubmed ablations (rcm/auto, v12) ==="
for abl in "" "onehot" "gather" "scatter" "accdot" "payload" "dmaw"; do
  echo "--- ablate='$abl' ---"
  GAT_TPU_V7_ABLATE="$abl" GAT_TPU_PUBMED_CASES="rcm/auto" \
    timeout 1200 python benchmarks/probe_pubmed.py
done
echo "=== Cora ablations (auto, v12, inner=400) ==="
for abl in "" "onehot" "gather" "scatter"; do
  echo "--- ablate='$abl' ---"
  GAT_TPU_V7_ABLATE="$abl" GAT_TPU_BENCH_INNER=400 \
    GAT_TPU_PROBE_CASES="auto:0.6:1:1:bfloat16:1" \
    timeout 1200 python benchmarks/probe_v6_insitu.py
done
echo "=== batch 13 done ==="
