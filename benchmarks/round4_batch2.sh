#!/bin/bash
# Round-4 on-chip batch 2: Pubmed hybrid A/B (VERDICT r3 item 3).
cd /root/repo
export GAT_TPU_GEMM_DTYPE=bfloat16
GAT_TPU_PUBMED_CASES="rcm,cluster,cluster@128,cluster@512" \
  timeout 3600 python benchmarks/probe_pubmed.py
echo "=== batch 2 done ==="
