#!/bin/bash
# Round-4 closing batch: Cora device profile, on-chip training sanity,
# second official bench session (reproducibility).
cd /root/repo
echo "=== Cora closing device profile ==="
export GAT_TPU_GEMM_DTYPE=bfloat16
timeout 1800 python benchmarks/profile_step.py --stage step --top 12
echo "=== on-chip training sanity: Cora rcm ==="
unset GAT_TPU_GEMM_DTYPE
timeout 1500 python -m gat_pytorch_tpu.cli.train --dataset Cora --reorder rcm --num_epochs 200
echo "=== on-chip training sanity: Pubmed rcm (round-4 headline path) ==="
timeout 1500 python -m gat_pytorch_tpu.cli.train --dataset Pubmed --reorder rcm --num_epochs 60
echo "=== second official bench session ==="
timeout 3600 python bench.py
echo "=== batch 12 done ==="
