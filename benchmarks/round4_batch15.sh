#!/bin/bash
# Round-4 batch 15: cost-model layout confirm + FINAL official bench.
cd /root/repo
export GAT_TPU_GEMM_DTYPE=bfloat16
GAT_TPU_PUBMED_CASES="rcm/auto" timeout 1500 python benchmarks/probe_pubmed.py
unset GAT_TPU_GEMM_DTYPE
timeout 3600 python bench.py
echo "=== batch 15 done ==="
