#!/bin/bash
# v8c: payload/dsdst at contraction dtype + DMA-bubble attribution.
LOG=${1:-/tmp/v8c_tpu.log}
cd /root/repo
run() {
  echo "=== $(date +%H:%M:%S) $*" >> "$LOG"
  timeout "$T" "$@" >> "$LOG" 2>&1
  echo "--- exit $? at $(date +%H:%M:%S)" >> "$LOG"
}

# 1. parity with the dt payload path (bf16 mode rounds gradient gathers
#    the same way it already rounds the h gather — expect ~1e-4 losses
#    to stay well under the 1e-4 gate... verify)
T=3600 run python benchmarks/check_v7_parity.py

# 2. banded 5M: new baseline + DMA attribution
T=7200 run env GAT_TPU_PROBE_CASES="auto,auto/dmam,auto/dmaw,auto/dmam+dmaw,auto/onehot+scores+gather+scatter+payload+exp+expander+accdot+cap+dmam+dmaw" \
  python benchmarks/probe_banded.py

# 3. Cora headline
T=3600 run python bench.py --skip_scale

echo "ALL DONE $(date +%H:%M:%S)" >> "$LOG"
