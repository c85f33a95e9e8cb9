#!/bin/bash
# TPU measurement queue — run serially the moment the axon tunnel is back.
# (The TPU is single-tenant: NEVER run two of these concurrently, and do
# not run this while the grading driver's bench is executing.)
#
# Usage: bash benchmarks/run_tpu_queue.sh [logdir]
# Each step logs to <logdir>/<step>.log and the queue continues past
# individual failures; the summary table prints at the end.

set -u
cd "$(dirname "$0")/.."
LOGDIR=${1:-output/tpu_queue}
mkdir -p "$LOGDIR"
export JAX_COMPILATION_CACHE_DIR=${JAX_COMPILATION_CACHE_DIR:-$PWD/.jax_cache}

declare -a NAMES RCS

step() {
    local name=$1; shift
    echo "=== $name: $* (log: $LOGDIR/$name.log)"
    timeout 3600 "$@" > "$LOGDIR/$name.log" 2>&1
    local rc=$?
    NAMES+=("$name"); RCS+=("$rc")
    echo "=== $name rc=$rc"
}

# 0. tunnel sanity — bail early if the TPU is still unreachable
step tpu_sanity python -c "import jax; print(jax.devices())"
if [ "${RCS[0]}" != 0 ]; then
    echo "TPU unreachable — aborting queue"; exit 1
fi

# 0b. driver-hook insurance: the flagship forward compiles on the chip
step entry python -c "import __graft_entry__ as g; fn, args = g.entry(); \
import jax; jax.jit(fn).lower(*args).compile(); print('entry ok')"

# 0c. retrain the chain if the (gitignored) snapshots were wiped with the
# container.  Idempotent: skipped whenever a snap_* already exists.
if ! ls -d output/detector_scene/snap_* >/dev/null 2>&1; then
    step train_detector python scripts/train_detector.py \
        --config configs/detection/mnv2_ssd_300_scene.py
fi
if ! ls output/scene_regressor_el0/snap_* >/dev/null 2>&1; then
    step train_el0 python scripts/main.py \
        --config configs/scene_regressor_el0.py
fi

# 1. int8 MXU probe: does int8 actually beat bf16 through this PJRT stack?
step probe_int8 python benchmarks/probe_int8.py

# 2. graded bench (batch sweep, median of 3, int8 extra leg)
step bench python bench.py

# 3. per-op serving profile after the bf16-preprocess rewrite
step profile_serving python benchmarks/profile_serving.py

# 4. protocol legs on the real chip (match the CPU-measured ladder)
step proto_el0_softdup python benchmarks/validation/protocol_end_to_end.py \
    --skip_train --reg_config configs/scene_regressor_el0.py \
    --refine_passes 1 --det_tresh 0.01 --det_score_thr 0.005 \
    --soft_nms 0.5 --soft_nms_dup 0.75 \
    --report_dir output/protocol_reports_tpu_el0_softdup

# int8 PTQ, both stages (protocol-checked within 0.002 of bf16 on CPU)
step proto_el0_softdup_int8 python benchmarks/validation/protocol_end_to_end.py \
    --skip_train --reg_config configs/scene_regressor_el0.py \
    --refine_passes 1 --det_tresh 0.01 --det_score_thr 0.005 \
    --soft_nms 0.5 --soft_nms_dup 0.75 --int8 \
    --report_dir output/protocol_reports_tpu_el0_softdup_int8

# 5. weight-EMA regressor training (net-new vs reference) + its chain leg
if ! ls output/scene_regressor_el0_ema/snap_* >/dev/null 2>&1; then
    step train_el0_ema python scripts/main.py \
        --config configs/scene_regressor_el0_ema.py
fi

step proto_el0_ema python benchmarks/validation/protocol_end_to_end.py \
    --skip_train --reg_config configs/scene_regressor_el0_ema.py \
    --refine_passes 1 --det_tresh 0.01 --det_score_thr 0.005 \
    --soft_nms 0.5 --soft_nms_dup 0.75 \
    --report_dir output/protocol_reports_tpu_el0_ema

echo
echo "=== queue summary"
for i in "${!NAMES[@]}"; do
    echo "${NAMES[$i]}: rc=${RCS[$i]}"
done
grep -h '"metric"' "$LOGDIR/bench.log" 2>/dev/null || true
