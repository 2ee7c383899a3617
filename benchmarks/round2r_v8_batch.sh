#!/bin/bash
# v8 raw-score pipeline on-chip validation. ONE TPU process at a time.
LOG=${1:-/tmp/v8_tpu.log}
cd /root/repo
run() {
  echo "=== $(date +%H:%M:%S) $*" >> "$LOG"
  timeout "$T" "$@" >> "$LOG" 2>&1
  echo "--- exit $? at $(date +%H:%M:%S)" >> "$LOG"
}

# 1. parity first (small banded workload; catches Mosaic miscompiles
#    before the big runs)
T=3600 run python benchmarks/check_v7_parity.py

# 2. banded 5M: v8 vs v5, plus remaining construction cost under v8
T=5400 run env GAT_TPU_PROBE_CASES="auto,0,auto/onehot,auto/cap" \
  python benchmarks/probe_banded.py

# 3. Cora headline with v8 (RCM Cora routes v7)
T=3600 run python bench.py --skip_scale

echo "ALL DONE $(date +%H:%M:%S)" >> "$LOG"
