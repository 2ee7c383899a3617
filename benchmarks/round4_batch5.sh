#!/bin/bash
# Round-4 batch 5: v12 n-pack A/B (Cora, Pubmed), banded regression check,
# Pubmed hybrid with the sorted-grad XLA remainder.
cd /root/repo
export GAT_TPU_GEMM_DTYPE=bfloat16
echo "=== Cora v12 OFF / ON (auto, dropout 0.6, bf16 gemm) ==="
GAT_TPU_V12=0 GAT_TPU_PROBE_CASES="auto:0.6:1:1:bfloat16:1" \
  timeout 1800 python benchmarks/probe_v6_insitu.py
GAT_TPU_V12=1 GAT_TPU_PROBE_CASES="auto:0.6:1:1:bfloat16:1" \
  timeout 1800 python benchmarks/probe_v6_insitu.py
echo "=== Pubmed: hybrid (v12 + sorted-grad remainder) vs v5 ==="
GAT_TPU_V12=1 GAT_TPU_PUBMED_CASES="cluster/auto,cluster/0,rcm/auto" \
  timeout 2700 python benchmarks/probe_pubmed.py
echo "=== banded regression check (nhf=128: v12 must not engage) ==="
GAT_TPU_PROBE_CASES="auto" GAT_TPU_BENCH_INNER=10 timeout 1800 \
  python benchmarks/probe_banded.py
echo "=== batch 5 done ==="
