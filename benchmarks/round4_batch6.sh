#!/bin/bash
# Round-4 batch 6: Pubmed forced-windowed probes (v12 shrinks the
# packed table to VMEM scale) + banded re-confirmation.
cd /root/repo
export GAT_TPU_GEMM_DTYPE=bfloat16
echo "=== Pubmed: forced v7+v12 (rcm window / hybrid eb sweep) ==="
GAT_TPU_V6_VMEM_MB=15 GAT_TPU_V12=1 \
GAT_TPU_PUBMED_CASES="rcm/1,cluster@512/1,cluster@1024/1,cluster/0" \
  timeout 3600 python benchmarks/probe_pubmed.py
echo "=== banded re-confirmation (same session) ==="
GAT_TPU_PROBE_CASES="auto" GAT_TPU_BENCH_INNER=10 timeout 1800 \
  python benchmarks/probe_banded.py
echo "=== Cora official-shape check (inner=400) ==="
GAT_TPU_V12=1 GAT_TPU_BENCH_INNER=400 \
GAT_TPU_PROBE_CASES="auto:0.6:1:1:bfloat16:1" \
  timeout 1800 python benchmarks/probe_v6_insitu.py
echo "=== batch 6 done ==="
