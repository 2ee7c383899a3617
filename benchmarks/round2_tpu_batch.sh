#!/bin/bash
# Round-2 TPU measurement batch (runs after the kernel sweep frees the
# compile queue). Unbuffered output -> /tmp/round2_tpu.log
set -x
exec > /tmp/round2_tpu.log 2>&1

echo "=== pib gather A/B (table fwd, 1M) ==="
GAT_TPU_GATHER=lane_pib python benchmarks/kernel_bench.py \
    --nodes 100000 --edges 1000000 --backends table

echo "=== bench --measure_baseline (Cora XLA) ==="
python bench.py --measure_baseline

echo "=== full bench (both workloads) ==="
python bench.py

echo "=== sharded compiled check (1-dev mesh, pallas) ==="
python benchmarks/sharded_tpu_check.py --steps 30

echo "=== cora bisect ==="
GAT_TPU_BENCH_SCAN=50 python benchmarks/cora_bisect.py

echo "=== scale bench with bf16 tables ==="
GAT_TPU_H_DTYPE=bfloat16 GAT_TPU_BENCH_SCALE_INNER=10 python bench.py

echo "=== DONE ==="
