#!/bin/bash
# v8d: sliding d(h) accumulator on-chip validation + perf.
LOG=${1:-/tmp/v8d_tpu.log}
cd /root/repo
run() {
  echo "=== $(date +%H:%M:%S) $*" >> "$LOG"
  timeout "$T" "$@" >> "$LOG" 2>&1
  echo "--- exit $? at $(date +%H:%M:%S)" >> "$LOG"
}

# 1. parity (compiles the sliding backward at 1M-edge banded shapes)
T=3600 run python benchmarks/check_v7_parity.py

# 2. banded 5M: new baseline + remaining window-stream share
T=5400 run env GAT_TPU_PROBE_CASES="auto,auto/dmaw,auto/dmam" \
  python benchmarks/probe_banded.py

# 3. Cora headline
T=3600 run python bench.py --skip_scale

echo "ALL DONE $(date +%H:%M:%S)" >> "$LOG"
