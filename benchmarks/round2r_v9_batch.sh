#!/bin/bash
# v9: GLOBAL combined/meta streams (cross-tile prefetch, one drain).
LOG=${1:-/tmp/v9_tpu.log}
cd /root/repo
run() {
  echo "=== $(date +%H:%M:%S) $*" >> "$LOG"
  timeout "$T" "$@" >> "$LOG" 2>&1
  echo "--- exit $? at $(date +%H:%M:%S)" >> "$LOG"
}

# 1. parity (fresh compile of the restructured kernel)
T=3600 run python benchmarks/check_v7_parity.py

# 2. banded 5M: new baseline + remaining stream overhead, dmak sweep
T=5400 run env GAT_TPU_PROBE_CASES="auto,auto/dmam" python benchmarks/probe_banded.py
T=5400 run env GAT_TPU_V7_DMAK=8 GAT_TPU_PROBE_CASES="auto" python benchmarks/probe_banded.py
T=5400 run env GAT_TPU_V7_DMAK=2 GAT_TPU_PROBE_CASES="auto" python benchmarks/probe_banded.py

# 3. Cora headline (dropout path; small tiles — checks no regression)
T=3600 run python bench.py --skip_scale

echo "ALL DONE $(date +%H:%M:%S)" >> "$LOG"
