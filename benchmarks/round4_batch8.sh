#!/bin/bash
# Round-4 batch 8: int8 one-hot A/B on banded + Cora; sharded windowed
# re-measure (same session as an unsharded banded reference).
cd /root/repo
export GAT_TPU_GEMM_DTYPE=bfloat16
echo "=== banded: bf16 vs int8 one-hots ==="
GAT_TPU_PROBE_CASES="auto" GAT_TPU_BENCH_INNER=10 timeout 1800 \
  python benchmarks/probe_banded.py
GAT_TPU_ONEHOT_DTYPE=int8 GAT_TPU_PROBE_CASES="auto" GAT_TPU_BENCH_INNER=10 \
  timeout 1800 python benchmarks/probe_banded.py
echo "=== Cora: int8 one-hots (v12 + int8) ==="
GAT_TPU_ONEHOT_DTYPE=int8 GAT_TPU_BENCH_INNER=400 \
GAT_TPU_PROBE_CASES="auto:0.6:1:1:bfloat16:1" \
  timeout 1800 python benchmarks/probe_v6_insitu.py
echo "=== sharded windowed banded (same session as ref above) ==="
timeout 2400 python benchmarks/sharded_tpu_check.py --dst_owned --windowed \
  --bench_model --nodes 500000 --deg 10 --banded 1024 --inner 10 --steps 30
echo "=== batch 8 done ==="
