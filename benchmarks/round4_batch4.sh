#!/bin/bash
# Round-4 batch 4: (a) Pubmed hybrid re-A/B with the XLA remainder;
# (b) scale decomposition with the fixed scalar-sync probe.
cd /root/repo
export GAT_TPU_GEMM_DTYPE=bfloat16
echo "=== a. Pubmed hybrid (XLA remainder) vs v5 ==="
GAT_TPU_PUBMED_CASES="cluster/0,cluster/auto,cluster/auto/nodrop,cluster/0/nodrop" \
  timeout 3600 python benchmarks/probe_pubmed.py
echo "=== b. scale decomposition (fixed sync) ==="
timeout 3600 python benchmarks/probe_scale.py
echo "=== batch 4 done ==="
