#!/bin/bash
# TPU queue, phase 4 — fresh-container replay of the phase-3 program.
# The container reset (round 3, session 5) wiped all gitignored
# checkpoints again, so every chain measurement needs the detector and
# the winning wing regressor retrained first.  Order is value-first so
# an early cutoff still lands the headline rows:
#   1. fixed int8 MXU conv probe (phase-2 crash was a scan-carry shape
#      bug; channel-square rewrite landed in 7986fd0)
#   2. retrain detector + wing regressor (resume-aware, <1h each)
#   3. wing chain at the miss-recovery operating point (headline row)
#   4. wing chain at HARD-NMS t=0.05 — undiluted per-prediction mean
#      3D IoU (the one VERDICT-r2 column soft-NMS dilutes)
#   5. wing GT-box ceiling (cross-container confirmation of 0.914/0.698)
#   6. wing_big arm (60 ep + EMA on the winning loss)
#   7. r288 arm (resolution A/B, l1)
# Every training step resumes from the newest snap_* if interrupted.
# Single-tenant TPU: run alone (never concurrently with bench.py).
#
# Usage: bash benchmarks/run_tpu_queue_phase4.sh [logdir]

set -u
cd "$(dirname "$0")/.."
LOGDIR=${1:-output/tpu_queue4}
mkdir -p "$LOGDIR"
export JAX_COMPILATION_CACHE_DIR=${JAX_COMPILATION_CACHE_DIR:-$PWD/.jax_cache}

declare -a NAMES RCS

step() {
    local name=$1; shift
    echo "=== $name: $* (log: $LOGDIR/$name.log)"
    timeout 16000 "$@" > "$LOGDIR/$name.log" 2>&1
    local rc=$?
    NAMES+=("$name"); RCS+=("$rc")
    echo "=== $name rc=$rc"
}

# Train (or resume) a regressor arm unless its final snapshot exists.
train_arm() {
    local arm=$1 last_epoch=$2
    local cfg=configs/scene_regressor_el0_${arm}.py
    local out=output/scene_regressor_el0_${arm}
    if [ -d "${out}/snap_${last_epoch}" ]; then
        echo "=== train_${arm}: snap_${last_epoch} exists, skipping"
        return
    fi
    local LAST
    LAST=$(ls -d ${out}/snap_* 2>/dev/null | sed 's/.*snap_//' | sort -n | tail -1)
    if [ -n "${LAST:-}" ]; then
        sed -e "s#resume=''#resume='./${out}/snap_${LAST}'#" \
            "$cfg" > "$LOGDIR/${arm}_resume_cfg.py"
        step train_${arm} python scripts/main.py \
            --config "$LOGDIR/${arm}_resume_cfg.py" --output_dir "$out"
    else
        step train_${arm} python scripts/main.py --config "$cfg"
    fi
}

measure_arm() {
    local arm=$1
    local cfg=configs/scene_regressor_el0_${arm}.py
    step proto_${arm} python benchmarks/validation/protocol_end_to_end.py \
        --skip_train --reg_config ${cfg} \
        --refine_passes 1 --det_tresh 0.01 --det_score_thr 0.005 \
        --soft_nms 0.5 --soft_nms_dup 0.75 \
        --report_dir output/protocol_reports_${arm}
}

step tpu_sanity python -c "import jax; print(jax.devices())"
if [ "${RCS[0]}" != 0 ]; then
    echo "TPU unreachable — aborting queue"; exit 1
fi

# 1. quick checkpoint-free probes: fixed int8 conv probe + windowed-crop
#    A/B (a0eb88e landed the option unmeasured; if the window wins,
#    flip EngineConfig.windowed_crop and re-bench)
step probe_int8 python benchmarks/probe_int8.py
step probe_crop python benchmarks/probe_crop.py

# 2. retrain the chain (fresh container — snapshots wiped)
if ! ls -d output/detector_scene/snap_* >/dev/null 2>&1; then
    step train_detector python scripts/train_detector.py \
        --config configs/detection/mnv2_ssd_300_scene.py
fi
train_arm wing 39

# 3. wing chain, miss-recovery operating point (headline)
measure_arm wing

# 4. wing chain, hard NMS t=0.05 (undiluted per-prediction 3D IoU)
step proto_wing_t05 python benchmarks/validation/protocol_end_to_end.py \
    --skip_train --reg_config configs/scene_regressor_el0_wing.py \
    --refine_passes 1 --det_tresh 0.05 \
    --report_dir output/protocol_reports_wing_t05

# 5. wing GT-box ceiling (cross-container confirmation)
step ceiling_wing python benchmarks/validation/protocol_end_to_end.py \
    --skip_train --reg_config configs/scene_regressor_el0_wing.py --gt_boxes \
    --report_dir output/protocol_reports_ceiling_wing

# 6. wing_big arm (2x epochs, EMA, wing loss)
train_arm wing_big 59
measure_arm wing_big

# 7. r288 arm
train_arm r288 39
measure_arm r288

echo
echo "=== queue summary"
for i in "${!NAMES[@]}"; do
    echo "${NAMES[$i]}: rc=${RCS[$i]}"
done
