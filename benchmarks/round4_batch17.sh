#!/bin/bash
# Round-4 wrap: every reference dataset family trains at HEAD on-chip.
cd /root/repo
echo "=== Citeseer ==="
timeout 900 python -m gat_pytorch_tpu.cli.train --dataset Citeseer --reorder rcm --num_epochs 60 2>&1 | tail -2
echo "=== PPI (attention_penalty 0.1 — the fused lambda path) ==="
timeout 1200 python -m gat_pytorch_tpu.cli.train --dataset PPI --num_epochs 8 --attention_penalty 0.1 2>&1 | tail -2
echo "=== PATTERN (1 epoch smoke) ==="
timeout 1500 python -m gat_pytorch_tpu.cli.train --dataset PATTERN --num_epochs 1 2>&1 | tail -2
echo "=== batch 17 done ==="
