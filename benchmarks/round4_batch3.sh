#!/bin/bash
# Round-4 on-chip batch 3: (a) Pubmed decomposition — v5 vs hybrid at
# fixed cluster ordering, with/without dropout; (b) the random-expander
# step decomposition (VERDICT r3 item 2).
cd /root/repo
export GAT_TPU_GEMM_DTYPE=bfloat16
echo "=== a. Pubmed: v5-vs-hybrid at fixed ordering, dropout A/B ==="
GAT_TPU_PUBMED_CASES="cluster/0,cluster/auto,cluster/0/nodrop,cluster/auto/nodrop" \
  timeout 3600 python benchmarks/probe_pubmed.py
echo "=== b. scale (random-5M) step decomposition ==="
timeout 3600 python benchmarks/probe_scale.py
echo "=== batch 3 done ==="
