#!/bin/bash
# Round-4 batch 14: Pubmed wb-cap A/B with workable slack (the earlier
# sweep's slack was below the acceptance threshold -> naive wb).
cd /root/repo
export GAT_TPU_GEMM_DTYPE=bfloat16
GAT_TPU_V7_TARGET=2048 GAT_TPU_V7_SLOT_SLACK=0.5 \
GAT_TPU_PUBMED_CASES="rcm/auto" timeout 1500 python benchmarks/probe_pubmed.py
GAT_TPU_V7_TARGET=1536 GAT_TPU_V7_SLOT_SLACK=1.0 \
GAT_TPU_PUBMED_CASES="rcm/auto" timeout 1500 python benchmarks/probe_pubmed.py
echo "=== batch 14 done ==="
