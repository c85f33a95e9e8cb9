#!/bin/bash
# Round-5 chain driver: wait for the in-flight phase-6a queue (re-seed
# A/B), then run the remaining round-5 measurement phases in value-per-
# minute order so a round boundary cuts the cheapest tail:
#
#   1. roofline A/B + fresh serving profile (phase 6c items 1-2, ~20 min
#      — the crop-bytes-cut perf headline lands even if the round ends
#      during the long trainings below)
#   2. phase 6b — cascade detector + box-quality 2x2 + undiluted chain
#      rows + downscale pricing (VERDICT r4 items 1 & 4)
#   3. phase 6c — hpo_big train/proto (resume-aware) + final bench
#      (VERDICT r4 item 2); its roofline/profile steps self-skip on the
#      done-log gate
#
# Usage: bash benchmarks/run_tpu_queue_round5_chain.sh [6a_pid]

set -u
cd "$(dirname "$0")/.."
PID=${1:-}
if [ -n "$PID" ]; then
    echo "waiting for phase-6a (pid $PID) ..."
    while kill -0 "$PID" 2>/dev/null; do sleep 30; done
    echo "phase-6a exited"
fi
export JAX_COMPILATION_CACHE_DIR=${JAX_COMPILATION_CACHE_DIR:-$PWD/.jax_cache}

LOG6C=output/tpu_queue6c
mkdir -p "$LOG6C"

# 1. pulled-forward cheap perf legs (same logs/gates as phase 6c)
if [ -s "$LOG6C/roofline_ab.log" ] && grep -q 'HBM peak' "$LOG6C/roofline_ab.log"; then
    echo "=== roofline_ab already measured"
else
    timeout 3000 python benchmarks/roofline_serving.py --batch 32 \
        > "$LOG6C/roofline_ab.log" 2>&1
    echo "=== roofline_ab rc=$?"
fi
if [ -s "$LOG6C/profile_serving.log" ] && grep -qi 'total' "$LOG6C/profile_serving.log"; then
    echo "=== profile_serving already measured"
else
    timeout 3000 python benchmarks/profile_serving.py \
        > "$LOG6C/profile_serving.log" 2>&1
    echo "=== profile_serving rc=$?"
fi

# 2. box quality + chain + downscale (the round's top item)
bash benchmarks/run_tpu_queue_phase6b.sh

# 3. the long tail: hpo_big + final bench
bash benchmarks/run_tpu_queue_phase6c.sh
