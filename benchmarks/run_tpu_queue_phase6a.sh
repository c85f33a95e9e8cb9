#!/bin/bash
# TPU queue, phase 6a — round-5 part A: re-seed the headline A/B
# (VERDICT r4 item 3).  The round-4 "HPO beats the reference's published
# w/eps on every column" claim rests on ONE training seed per arm while
# the repo's own measured scene-draw variance is larger than the claimed
# deltas; this queue trains seed-107 replicates of both arms on the SAME
# scene_seed=23 shards and measures them at the identical miss-recovery
# operating point, so BASELINE.md can report paired deltas for two seeds.
#   1. hpo_s2 (w=4.6616/eps=0.0967, seed 107) train + chain protocol
#   2. wing_s2 (w=5.18/eps=1, seed 107) train + chain protocol
# Container survived the round boundary: detector_scene/snap_39 and the
# scene cache are in place, so no retrain preamble is needed (gated
# anyway).  Single-tenant TPU: run alone (never concurrently with
# bench.py or another queue).
#
# Usage: bash benchmarks/run_tpu_queue_phase6a.sh [logdir]

set -u
cd "$(dirname "$0")/.."
LOGDIR=${1:-output/tpu_queue6a}
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
    return $rc
}

skip_step() {
    local name=$1 why=$2
    echo "=== $name SKIPPED: $why"
    NAMES+=("$name"); RCS+=("SKIP($why)")
}

rc_of() {
    local i
    for i in "${!NAMES[@]}"; do
        if [ "${NAMES[$i]}" = "$1" ]; then echo "${RCS[$i]}"; return; fi
    done
    echo ""
}

train_arm() {
    local arm=$1 last_epoch=$2
    local cfg=configs/scene_regressor_el0_${arm}.py
    local out=output/scene_regressor_el0_${arm}
    if [ -d "${out}/snap_${last_epoch}" ]; then
        echo "=== train_${arm}: snap_${last_epoch} exists, skipping"
        NAMES+=("train_${arm}"); RCS+=("0")
        return
    fi
    local LAST
    LAST=$(ls -d ${out}/snap_* 2>/dev/null | sed 's/.*snap_//' | sort -n | tail -1)
    if [ -n "${LAST:-}" ]; then
        sed -e "s#resume=''#resume='./${out}/snap_${LAST}'#" \
            "$cfg" > "$LOGDIR/${arm}_resume_cfg.py"
        if ! grep -q "snap_${LAST}" "$LOGDIR/${arm}_resume_cfg.py"; then
            echo "=== train_${arm}: resume substitution FAILED (cfg has no resume='')"
            NAMES+=("train_${arm}"); RCS+=("RESUME_SUBST_FAILED")
            return
        fi
        step train_${arm} python scripts/main.py \
            --config "$LOGDIR/${arm}_resume_cfg.py" --output_dir "$out"
    else
        step train_${arm} python scripts/main.py --config "$cfg"
    fi
}

proto_done() {
    [ -s "$LOGDIR/$1.log" ] && grep -q '^MEAN' "$LOGDIR/$1.log"
}

# Identical operating point to round 4's proto_hpo/proto_wing so the
# seed-107 rows pair exactly against the seed-5 rows already in
# BASELINE.md (miss-recovery: det_tresh 0.01, soft-NMS 0.5).
measure_arm() {
    local arm=$1
    local cfg=configs/scene_regressor_el0_${arm}.py
    local trc
    if proto_done "proto_${arm}"; then
        echo "=== proto_${arm}: already measured (log has MEAN row), skipping"
        NAMES+=("proto_${arm}"); RCS+=("0")
        return
    fi
    trc=$(rc_of "train_${arm}")
    if [ "$trc" != 0 ]; then
        skip_step proto_${arm} "train_${arm} rc=${trc:-never_ran}"; return
    fi
    step proto_${arm} python benchmarks/validation/protocol_end_to_end.py \
        --skip_train --reg_config ${cfg} \
        --refine_passes 1 --det_tresh 0.01 --det_score_thr 0.005 \
        --soft_nms 0.5 --soft_nms_dup 0.75 \
        --report_dir output/protocol_reports_${arm}
}

# jax.devices() succeeds with CPU fallback — assert the platform and
# CHECK THE RECORDED rc (the phase-5 `if [ $? != 0 ]` guard was dead
# code because step() ended in an echo — ADVICE r4 medium).
step tpu_sanity python -c "import jax; ds = jax.devices(); assert ds[0].platform == 'tpu', ds; print(ds)"
if [ "$(rc_of tpu_sanity)" != 0 ]; then
    echo "TPU unreachable — aborting queue"; exit 1
fi

# The shared stage-1 detector must exist.  The round boundary wiped the
# container (no output/), so retrain it here when missing — the seed-107
# arms pair against EACH OTHER on this detector + the scene_seed=23
# shards, which is the comparison that carries the claim; cross-container
# drift vs the round-4 seed-5 rows is reported alongside, not hidden.
if [ -d output/detector_scene/snap_39 ]; then
    echo "=== train_detector: snap_39 exists, skipping"
    NAMES+=("train_detector"); RCS+=("0")
else
    step train_detector python scripts/train_detector.py \
        --config configs/detection/mnv2_ssd_300_scene.py --resume auto
    if [ "$(rc_of train_detector)" != 0 ]; then
        echo "detector retrain failed — aborting queue"; exit 1
    fi
fi

train_arm hpo_s2 39
measure_arm hpo_s2

train_arm wing_s2 39
measure_arm wing_s2

echo
echo "=== queue summary"
for i in "${!NAMES[@]}"; do
    echo "${NAMES[$i]}: rc=${RCS[$i]}"
done
