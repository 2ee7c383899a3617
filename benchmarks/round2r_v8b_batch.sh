#!/bin/bash
# v8 follow-up: block-size re-sweep (the VPU/MXU balance changed) +
# floor attribution + full official bench. ONE TPU process at a time.
LOG=${1:-/tmp/v8b_tpu.log}
cd /root/repo
run() {
  echo "=== $(date +%H:%M:%S) $*" >> "$LOG"
  timeout "$T" "$@" >> "$LOG" 2>&1
  echo "--- exit $? at $(date +%H:%M:%S)" >> "$LOG"
}

# 1. block-size re-sweep under v8 (defaults 1024:512 were tuned pre-v8)
T=7200 run env GAT_TPU_PROBE_CASES="1024:512,1536:512,2048:512,1024:1024,1024:256,768:384" \
  python benchmarks/probe_v7_blocks.py

# 2. floor attribution at the default blocks
T=7200 run env GAT_TPU_PROBE_CASES="auto,auto/exp,auto/expander,auto/accdot,auto/onehot+scores+gather+scatter+payload+exp+expander+accdot+cap" \
  python benchmarks/probe_banded.py

# 3. full official bench at HEAD
T=3600 run python bench.py

echo "ALL DONE $(date +%H:%M:%S)" >> "$LOG"
