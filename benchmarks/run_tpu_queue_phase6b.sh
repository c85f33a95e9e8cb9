#!/bin/bash
# TPU queue, phase 6b — round-5 part B: stage-1 box quality (VERDICT r4
# item 1) + downscale pricing (item 4), all in THIS container so every
# A/B shares the same scene draws and stage-2 snapshot.
#
#   1. train the cascade+GIoU detector (configs/detection/
#      mnv2_ssd_300_scene_cascade.py)
#   2. held-out box-quality 2x2: {base,cascade} x {plain,box-vote 0.5}
#      (target: matched mean IoU 0.871 -> >=0.90, kill the 13 px p90
#      bike/camera tails)
#   3. undiluted hard-NMS t=0.05 chain rows with the SAME regressor
#      (hpo_s2 from phase 6a): base detector, base+vote, cascade,
#      cascade+vote — against the GT-box ceiling row (target: chain mean
#      3D IoU >= 0.67, r4: 0.621 vs ceiling 0.698)
#   4. host_downscale 2 and 3 protocol rows at the recommended operating
#      point (prices the only host-included mode that beats torch-CPU)
#
# Requires phase 6a to have finished (detector_scene/snap_39 + hpo_s2
# trained).  Single-tenant TPU: run alone.
#
# Usage: bash benchmarks/run_tpu_queue_phase6b.sh [logdir]

set -u
cd "$(dirname "$0")/.."
LOGDIR=${1:-output/tpu_queue6b}
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

done_log() {   # completed-measurement gate: log exists and has its MEAN row
    [ -s "$LOGDIR/$1.log" ] && grep -q '^MEAN' "$LOGDIR/$1.log"
}

step tpu_sanity python -c "import jax; ds = jax.devices(); assert ds[0].platform == 'tpu', ds; print(ds)"
if [ "$(rc_of tpu_sanity)" != 0 ]; then
    echo "TPU unreachable — aborting queue"; exit 1
fi

for need in output/detector_scene/snap_39 output/scene_regressor_el0_hpo_s2/snap_39; do
    if [ ! -d "$need" ]; then
        echo "$need missing — run run_tpu_queue_phase6a.sh first"; exit 1
    fi
done

# 1. cascade detector (resume-aware)
if [ -d output/detector_cascade/snap_39 ]; then
    echo "=== train_cascade: snap_39 exists, skipping"
    NAMES+=("train_cascade"); RCS+=("0")
else
    step train_cascade python scripts/train_detector.py \
        --config configs/detection/mnv2_ssd_300_scene_cascade.py --resume auto
fi

# 2. box-quality 2x2 on the held-out protocol scenes
boxq() {
    local name=$1 ckpt=$2; shift 2
    if done_log "$name"; then
        echo "=== $name: already measured, skipping"
        NAMES+=("$name"); RCS+=("0"); return
    fi
    step "$name" python benchmarks/validation/eval_box_quality.py \
        --det_checkpoint "$ckpt" "$@"
}
boxq boxq_base output/detector_scene/snap_39
boxq boxq_base_vote output/detector_scene/snap_39 --box_vote 0.5
if [ "$(rc_of train_cascade)" = 0 ]; then
    boxq boxq_cascade output/detector_cascade/snap_39
    boxq boxq_cascade_vote output/detector_cascade/snap_39 --box_vote 0.5
else
    skip_step boxq_cascade "train_cascade rc=$(rc_of train_cascade)"
    skip_step boxq_cascade_vote "train_cascade rc=$(rc_of train_cascade)"
fi

# 3. undiluted hard-NMS t=0.05 chain rows, all with the hpo_s2 regressor
REG=configs/scene_regressor_el0_hpo_s2.py
chain() {
    local name=$1; shift
    if done_log "$name"; then
        echo "=== $name: already measured, skipping"
        NAMES+=("$name"); RCS+=("0"); return
    fi
    step "$name" python benchmarks/validation/protocol_end_to_end.py \
        --skip_train --reg_config $REG --refine_passes 1 "$@"
}
chain ceiling_hpo_s2 --gt_boxes --refine_passes 0 \
    --report_dir output/protocol_reports_ceiling_hpo_s2
chain chain_base_t05 --det_tresh 0.05 \
    --report_dir output/protocol_reports_chain_base_t05
chain chain_base_vote_t05 --det_tresh 0.05 --box_vote 0.5 \
    --report_dir output/protocol_reports_chain_base_vote_t05
if [ "$(rc_of train_cascade)" = 0 ]; then
    chain chain_cascade_t05 --det_tresh 0.05 \
        --det_dir output/detector_cascade \
        --report_dir output/protocol_reports_chain_cascade_t05
    chain chain_cascade_vote_t05 --det_tresh 0.05 --box_vote 0.5 \
        --det_dir output/detector_cascade \
        --report_dir output/protocol_reports_chain_cascade_vote_t05
else
    skip_step chain_cascade_t05 "train_cascade failed"
    skip_step chain_cascade_vote_t05 "train_cascade failed"
fi

# 4. downscale pricing at the miss-recovery operating point (the mode's
#    recommended deployment), base detector
chain chain_ds2 --det_tresh 0.01 --det_score_thr 0.005 \
    --soft_nms 0.5 --soft_nms_dup 0.75 --host_downscale 2 \
    --report_dir output/protocol_reports_chain_ds2
chain chain_ds3 --det_tresh 0.01 --det_score_thr 0.005 \
    --soft_nms 0.5 --soft_nms_dup 0.75 --host_downscale 3 \
    --report_dir output/protocol_reports_chain_ds3
# downscale-1 twin at the SAME operating point so the ds2/ds3 deltas are
# measured against an identical-container reference
chain chain_ds1 --det_tresh 0.01 --det_score_thr 0.005 \
    --soft_nms 0.5 --soft_nms_dup 0.75 \
    --report_dir output/protocol_reports_chain_ds1

echo
echo "=== queue summary"
for i in "${!NAMES[@]}"; do
    echo "${NAMES[$i]}: rc=${RCS[$i]}"
done
