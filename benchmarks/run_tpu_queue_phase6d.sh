#!/bin/bash
# TPU queue, phase 6d — round-5 follow-ups after the 6b/6c chain:
#
#   1. RAW per-instruction serving profile: the stem-level summary says
#      convert_reduce_fusion is ~24% of device time but cannot say WHICH
#      instruction (frame resize? NMS softmax? head einsum) — the --raw
#      dump names each instruction with shapes so the bytes attribution
#      in BASELINE.md can stop guessing (VERDICT r4 item 6 follow-up).
#   2. batch-64 roofline point: the 62.3%-of-HBM-peak row is batch 32;
#      one more point says whether the remaining gap is batch-amortizable
#      dispatch or intrinsic to the program.
#
# Usage: bash benchmarks/run_tpu_queue_phase6d.sh [chain_pid]

set -u
cd "$(dirname "$0")/.."
PID=${1:-}
if [ -n "$PID" ]; then
    echo "waiting for 6b/6c chain (pid $PID) ..."
    while kill -0 "$PID" 2>/dev/null; do sleep 30; done
    echo "chain exited"
fi
export JAX_COMPILATION_CACHE_DIR=${JAX_COMPILATION_CACHE_DIR:-$PWD/.jax_cache}

LOGDIR=output/tpu_queue6d
mkdir -p "$LOGDIR"

declare -a NAMES RCS
step() {
    local name=$1; shift
    echo "=== $name: $* (log: $LOGDIR/$name.log)"
    timeout 3000 "$@" > "$LOGDIR/$name.log" 2>&1
    local rc=$?
    NAMES+=("$name"); RCS+=("$rc")
    echo "=== $name rc=$rc"
    return $rc
}

step tpu_sanity python -c "import jax; ds = jax.devices(); assert ds[0].platform == 'tpu', ds; print(ds)"
if [ "${RCS[0]}" != 0 ]; then echo "TPU unreachable — aborting"; exit 1; fi

if [ -s "$LOGDIR/profile_serving_raw.log" ] && grep -qi 'total' "$LOGDIR/profile_serving_raw.log"; then
    echo "=== profile_serving_raw already measured"
else
    step profile_serving_raw python benchmarks/profile_serving.py --raw --top 60
fi

if [ -s "$LOGDIR/roofline_b64.log" ] && grep -q 'HBM peak' "$LOGDIR/roofline_b64.log"; then
    echo "=== roofline_b64 already measured"
else
    step roofline_b64 python benchmarks/roofline_serving.py --batch 64
fi

echo
echo "=== queue summary"
for i in "${!NAMES[@]}"; do
    echo "${NAMES[$i]}: rc=${RCS[$i]}"
done
