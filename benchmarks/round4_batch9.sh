#!/bin/bash
# Round-4 batch 9: baseline re-measure + Pubmed/banded layout sweeps.
cd /root/repo
echo "=== XLA baseline re-measure (this session) ==="
timeout 2400 python bench.py --measure_baseline --skip_scale
export GAT_TPU_GEMM_DTYPE=bfloat16
echo "=== Pubmed layout sweep: wb target / slot slack ==="
GAT_TPU_V7_TARGET=2048 GAT_TPU_V7_SLOT_SLACK=0.15 \
GAT_TPU_PUBMED_CASES="rcm/auto" timeout 1500 python benchmarks/probe_pubmed.py
GAT_TPU_V7_TARGET=1024 GAT_TPU_V7_SLOT_SLACK=0.3 \
GAT_TPU_PUBMED_CASES="rcm/auto" timeout 1500 python benchmarks/probe_pubmed.py
GAT_TPU_V7_EB=1024 GAT_TPU_PUBMED_CASES="rcm/auto" timeout 1500 \
  python benchmarks/probe_pubmed.py
echo "=== banded eb/nb re-sweep at v12-era kernels ==="
GAT_TPU_V7_EB=2048 GAT_TPU_PROBE_CASES="auto" GAT_TPU_BENCH_INNER=10 \
  timeout 1500 python benchmarks/probe_banded.py
GAT_TPU_V7_TARGET=768 GAT_TPU_V7_SLOT_SLACK=0.1 GAT_TPU_PROBE_CASES="auto" \
  GAT_TPU_BENCH_INNER=10 timeout 1500 python benchmarks/probe_banded.py
echo "=== batch 9 done ==="
