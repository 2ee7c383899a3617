#!/bin/bash
# Round-4 on-chip batch 1: the sharded windowed single-sweep (VERDICT r3
# item 1 "done" criterion: banded-5M sharded step within ~1.2x the
# unsharded v11 time on a 1-device mesh).
cd /root/repo
export GAT_TPU_GEMM_DTYPE=bfloat16
echo "=== 1. unsharded banded reference (same session) ==="
GAT_TPU_PROBE_CASES="auto" GAT_TPU_BENCH_INNER=10 timeout 1800 \
  python benchmarks/probe_banded.py
echo "=== 2. sharded WINDOWED banded-5M (dst-owner, 1-device mesh) ==="
timeout 2400 python benchmarks/sharded_tpu_check.py --dst_owned --windowed \
  --bench_model --nodes 500000 --deg 10 --banded 1024 --inner 10 --steps 30
echo "=== 3. sharded v5 table banded-5M (the pre-round-4 sharded path) ==="
timeout 2400 python benchmarks/sharded_tpu_check.py --dst_owned \
  --bench_model --nodes 500000 --deg 10 --banded 1024 --inner 10 --steps 30
echo "=== batch 1 done ==="
