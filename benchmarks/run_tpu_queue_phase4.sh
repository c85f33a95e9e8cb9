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
# Every training step resumes from the newest snap_* if interrupted
# (train_detector.py --resume auto; train_arm's sed-generated resume
# config is verified before use).  A failed/timed-out train step marks
# its arm broken and the dependent measure steps are SKIPPED, not
# silently run against a half-trained snapshot (ADVICE r3).
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
    return $rc
}

# Record a step as skipped-due-to-dependency without running anything.
skip_step() {
    local name=$1 why=$2
    echo "=== $name SKIPPED: $why"
    NAMES+=("$name"); RCS+=("SKIP($why)")
}

# rc of a recorded step (empty if the step never ran)
rc_of() {
    local i
    for i in "${!NAMES[@]}"; do
        if [ "${NAMES[$i]}" = "$1" ]; then echo "${RCS[$i]}"; return; fi
    done
    echo ""
}

# Train (or resume) a regressor arm unless its FINAL snapshot exists.
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
        # ADVICE r3: abort the arm if the substitution did not take —
        # otherwise training silently restarts from epoch 0 over the
        # same output dir.
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

# A measurement step whose log already ends in the protocol MEAN row was
# completed by an earlier (possibly interrupted) queue run — skip it so a
# relaunch goes straight to the unfinished tail.
proto_done() {
    [ -s "$LOGDIR/$1.log" ] && grep -q '^MEAN' "$LOGDIR/$1.log"
}

# Protocol measurement of an arm; refuses to run if the arm's train
# step (or the shared detector) did not finish cleanly.
measure_arm() {
    local arm=$1
    local cfg=configs/scene_regressor_el0_${arm}.py
    local trc drc
    if proto_done "proto_${arm}"; then
        echo "=== proto_${arm}: already measured (log has MEAN row), skipping"
        NAMES+=("proto_${arm}"); RCS+=("0")
        return
    fi
    trc=$(rc_of "train_${arm}"); drc=$(rc_of "train_detector")
    if [ -n "$drc" ] && [ "$drc" != 0 ]; then
        skip_step proto_${arm} "train_detector rc=$drc"; return
    fi
    if [ "$trc" != 0 ]; then
        skip_step proto_${arm} "train_${arm} rc=${trc:-never_ran}"; return
    fi
    step proto_${arm} python benchmarks/validation/protocol_end_to_end.py \
        --skip_train --reg_config ${cfg} \
        --refine_passes 1 --det_tresh 0.01 --det_score_thr 0.005 \
        --soft_nms 0.5 --soft_nms_dup 0.75 \
        --report_dir output/protocol_reports_${arm}
}

# ADVICE r3: jax.devices() succeeds with CPU fallback — assert the platform.
step tpu_sanity python -c "import jax; ds = jax.devices(); assert ds[0].platform == 'tpu', ds; print(ds)"
if [ "${RCS[0]}" != 0 ]; then
    echo "TPU unreachable — aborting queue"; exit 1
fi

# 1. quick checkpoint-free probe: fixed int8 conv probe.  (The windowed
#    crop probe/A-B ran in rounds 3-4 and the option was DELETED per the
#    measurement: -9.6% end-to-end at batch 32 — BASELINE.md round 4.)
step probe_int8 python benchmarks/probe_int8.py

# 2. retrain the chain (fresh container — snapshots wiped).  Gate on the
#    FINAL snapshot; --resume auto picks up any partial run (ADVICE r3:
#    a bare snap_* glob here once benchmarked a half-trained detector).
if [ -d output/detector_scene/snap_39 ]; then
    echo "=== train_detector: snap_39 exists, skipping"
    NAMES+=("train_detector"); RCS+=("0")
else
    step train_detector python scripts/train_detector.py \
        --config configs/detection/mnv2_ssd_300_scene.py --resume auto
fi
train_arm wing 39

# 3. wing chain, miss-recovery operating point (headline)
measure_arm wing

# 4. wing chain, hard NMS t=0.05 (undiluted per-prediction 3D IoU)
if [ "$(rc_of train_detector)" = 0 ] && [ "$(rc_of train_wing)" = 0 ]; then
    if proto_done proto_wing_t05; then
        echo "=== proto_wing_t05: already measured, skipping"
    else
        step proto_wing_t05 python benchmarks/validation/protocol_end_to_end.py \
            --skip_train --reg_config configs/scene_regressor_el0_wing.py \
            --refine_passes 1 --det_tresh 0.05 \
            --report_dir output/protocol_reports_wing_t05
    fi

    # 5. wing GT-box ceiling (cross-container confirmation)
    if proto_done ceiling_wing; then
        echo "=== ceiling_wing: already measured, skipping"
    else
        step ceiling_wing python benchmarks/validation/protocol_end_to_end.py \
            --skip_train --reg_config configs/scene_regressor_el0_wing.py --gt_boxes \
            --report_dir output/protocol_reports_ceiling_wing
    fi
else
    skip_step proto_wing_t05 "wing chain not trained"
    skip_step ceiling_wing "wing chain not trained"
fi

# Arms ordered cheapest-first (the 1-core host loader bounds training at
# ~1.6 s/step, so wing_big's 60 ep x 128 steps is a ~3.4 h cell): the
# hpo/ema/r288 rows land even if the round boundary cuts wing_big, which
# resumes from its newest snapshot next relaunch.

# 6. HPO arm: the repo's own optuna study's best wing params
#    (w=4.6616, eps=0.0967 — output/tpu_queue5/hpo_wing.log) A/B'd
#    against the inherited w=5.18/eps=1 through the chain
train_arm hpo 39
measure_arm hpo

# 7. ema arm (40 ep, EMA 0.995, l1 — isolates EMA from the big-schedule arm)
train_arm ema 39
measure_arm ema

# 8. r288 arm
train_arm r288 39
measure_arm r288

# 9. wing_big arm (2x epochs + 2x data, EMA, wing loss — the expensive
#    ~3.4 h cell).  Gated behind RUN_WING_BIG=1 so a near-round-boundary
#    relaunch can land r288 without starting a cell that cannot finish
#    (it resumes from its newest snapshot when a future queue runs it).
if [ "${RUN_WING_BIG:-0}" = 1 ]; then
    train_arm wing_big 59
    measure_arm wing_big
else
    skip_step train_wing_big "RUN_WING_BIG not set (expensive cell deferred)"
fi

echo
echo "=== queue summary"
for i in "${!NAMES[@]}"; do
    echo "${NAMES[$i]}: rc=${RCS[$i]}"
done
