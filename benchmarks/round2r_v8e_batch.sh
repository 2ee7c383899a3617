#!/bin/bash
# v8e: grouped combined stream on-chip validation + dmak sweep.
LOG=${1:-/tmp/v8e_tpu.log}
cd /root/repo
run() {
  echo "=== $(date +%H:%M:%S) $*" >> "$LOG"
  timeout "$T" "$@" >> "$LOG" 2>&1
  echo "--- exit $? at $(date +%H:%M:%S)" >> "$LOG"
}

# 1. parity
T=3600 run python benchmarks/check_v7_parity.py

# 2. banded 5M: new baseline, remaining DMA overhead, dmak sweep
T=5400 run env GAT_TPU_PROBE_CASES="auto,auto/dmam" python benchmarks/probe_banded.py
T=5400 run env GAT_TPU_V7_DMAK=2 GAT_TPU_PROBE_CASES="auto" python benchmarks/probe_banded.py
T=5400 run env GAT_TPU_V7_DMAK=8 GAT_TPU_PROBE_CASES="auto" python benchmarks/probe_banded.py

# 3. Cora headline (dropout path exercises the dropout-rows comb layout)
T=3600 run python bench.py --skip_scale

echo "ALL DONE $(date +%H:%M:%S)" >> "$LOG"
