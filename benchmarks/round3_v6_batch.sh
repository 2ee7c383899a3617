#!/bin/bash
# Round-3 v6 on-chip validation + A/B batch. ONE TPU process at a time;
# each step under its own timeout so a Mosaic fault can't wedge the
# session. Log: tee to the file given as $1 (default /tmp/v6_tpu.log).
LOG=${1:-/tmp/v6_tpu.log}
cd /root/repo
run() {
  echo "=== $(date +%H:%M:%S) $*" >> "$LOG"
  timeout 1800 "$@" >> "$LOG" 2>&1
  echo "--- exit $? at $(date +%H:%M:%S)" >> "$LOG"
}

# 1. tiny on-chip smoke: v6 forward-only first (cheapest possible Mosaic
#    compile of both kernels comes in step 2)
run python benchmarks/window_bench.py --nodes 256 --edges 1500 --nh 2 --f 8 --backends v6
# 2. tiny grad (backward kernel compile)
run python benchmarks/window_bench.py --nodes 256 --edges 1500 --nh 2 --f 8 --grad --backends v6
# 3. Cora-shaped A/B, fwd then grad (whole-table-resident mode)
run python benchmarks/window_bench.py --nodes 2816 --edges 13312 --nh 8 --f 8 --backends v5 v6
run python benchmarks/window_bench.py --nodes 2816 --edges 13312 --nh 8 --f 8 --grad --backends v5 v6
# 4. second-layer shape (nh=1 f=7 -> padded lanes)
run python benchmarks/window_bench.py --nodes 2816 --edges 13312 --nh 1 --f 7 --grad --backends v5 v6
# 5. banded 1M-edge scale (the RCM case), grad
run python benchmarks/window_bench.py --nodes 100000 --edges 1000000 --nh 8 --f 16 --band 1024 --grad --backends v5 v6
# 6. end-to-end Cora bench: v6 auto (new default) vs v5 (GAT_TPU_V6=0)
run python bench.py --skip_scale
run env GAT_TPU_V6=0 python bench.py --skip_scale
echo "ALL DONE $(date +%H:%M:%S)" >> "$LOG"
