#!/bin/bash
# Round-2-resume on-chip batch. ONE TPU process at a time; each step
# under its own timeout so a Mosaic fault can't wedge the session.
# Log: tee to the file given as $1 (default /tmp/r2r_tpu.log).
LOG=${1:-/tmp/r2r_tpu.log}
cd /root/repo
run() {
  echo "=== $(date +%H:%M:%S) $*" >> "$LOG"
  timeout "$T" "$@" >> "$LOG" 2>&1
  echo "--- exit $? at $(date +%H:%M:%S)" >> "$LOG"
}

# 1. fresh official bench at HEAD (sanity + session calibration)
T=3600 run python bench.py

# 2. bf16 GEMM A/B on the official Cora config (v6 auto, dropout 0.6,
#    rbg chain, merged cap) — PERF.md round-3 lever: 5 GEMM fusions at
#    ~17.7us each are single passes over the 16 MB f32 feature matrix
T=2400 run env GAT_TPU_PROBE_CASES="auto:0.6:1:1:float32,auto:0.6:1:1:bfloat16" \
  GAT_TPU_BENCH_INNER=400 python benchmarks/probe_v6_insitu.py

# 3. v7 ablation sweep on the banded 5M-edge train step: attribute the
#    126ms of kernel time (fwd 30+29, bwd 34+32) to construction /
#    scores / gather / scatter / payload / cap-phase
T=7200 run env GAT_TPU_PROBE_CASES="auto,auto/cap,auto/onehot,auto/scores,auto/gather,auto/scatter,auto/payload,auto/onehot+scores+gather+scatter+payload" \
  python benchmarks/probe_banded.py

echo "ALL DONE $(date +%H:%M:%S)" >> "$LOG"
