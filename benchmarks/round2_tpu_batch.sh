#!/bin/bash
# Round-2 TPU measurement batch. Unbuffered output -> /tmp/round2_tpu.log
exec > /tmp/round2_tpu.log 2>&1
cd /root/repo
set -x

echo "=== grad composite at tuned config (1M) ==="
python benchmarks/kernel_bench.py --nodes 100000 --edges 1000000 \
    --backends table --grad --eb 1024 --nb 256

echo "=== bench --measure_baseline (Cora XLA) ==="
python bench.py --measure_baseline --skip_scale

echo "=== full bench (both workloads) ==="
python bench.py

echo "=== full bench with bf16 tables ==="
GAT_TPU_H_DTYPE=bfloat16 python bench.py

echo "=== sharded compiled check (1-dev mesh, pallas) ==="
python benchmarks/sharded_tpu_check.py --steps 30

echo "=== cora bisect ==="
GAT_TPU_BENCH_SCAN=50 python benchmarks/cora_bisect.py

echo "=== DONE ==="
