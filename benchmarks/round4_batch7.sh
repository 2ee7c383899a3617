#!/bin/bash
# Round-4 batch 7: auto-gate confirmation, int8 probe, lambda-path A/B,
# then the OFFICIAL bench line.
cd /root/repo
export GAT_TPU_GEMM_DTYPE=bfloat16
echo "=== Pubmed auto-engage confirmation ==="
GAT_TPU_PUBMED_CASES="rcm/auto" timeout 1800 python benchmarks/probe_pubmed.py
echo "=== int8 one-hot feasibility (VERDICT item 7) ==="
timeout 1200 python benchmarks/probe_int8_onehot.py
echo "=== lambda=1.0 attention-path A/B (VERDICT item 5) ==="
timeout 2400 python benchmarks/probe_attention_path.py
echo "=== OFFICIAL bench ==="
unset GAT_TPU_GEMM_DTYPE
timeout 3600 python bench.py
echo "=== batch 7 done ==="
