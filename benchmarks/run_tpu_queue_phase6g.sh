#!/bin/bash
# TPU queue, phase 6g — the hpo_big arm from a wiped container (the
# session boundary deleted output/ again, taking the 6f2 prerequisites
# with it).  Everything here is resume-aware and ordered so the MOST
# informative row lands first if the session is cut:
#
#   1. train hpo_big (2x scenes / 60 ep / EMA on the HPO loss) — any
#      snapshot counts; a timeout-cut training is an honestly-labeled arm
#   2. ceiling_big (GT boxes, refine 0) — needs ONLY the regressor and
#      answers the core question: does the big recipe raise the stage-2
#      ceiling above the 0.693 hpo_s2 ceiling at all?
#   3. retrain the cascade detector (wiped with output/)
#   4. chain_big_cv_t05 — hpo_big x (cascade + vote 0.5), undiluted
#      hard-NMS t=0.05: the row BASELINE.md's re-scope is pending on
#   5. same-container hpo_s2 pairing arms (train 39 ep + ceiling + chain)
#      so the big-vs-s2 comparison does not lean on cross-container drift
#
# Single-tenant TPU: run alone (never concurrently with bench.py).
# Usage: bash benchmarks/run_tpu_queue_phase6g.sh [logdir]

set -u
cd "$(dirname "$0")/.."
LOGDIR=${1:-output/tpu_queue6g}
mkdir -p "$LOGDIR"
export JAX_COMPILATION_CACHE_DIR=${JAX_COMPILATION_CACHE_DIR:-$PWD/.jax_cache}

declare -a NAMES RCS

step() {   # step <timeout_s> <name> cmd...
    local to=$1 name=$2; shift 2
    echo "=== $name: $* (log: $LOGDIR/$name.log)"
    timeout "$to" "$@" > "$LOGDIR/$name.log" 2>&1
    local rc=$?
    NAMES+=("$name"); RCS+=("$rc")
    echo "=== $name rc=$rc"
    return $rc
}

rc_of() {
    local i
    for i in "${!NAMES[@]}"; do
        if [ "${NAMES[$i]}" = "$1" ]; then echo "${RCS[$i]}"; return; fi
    done
    echo ""
}

proto_done() {
    [ -s "$LOGDIR/$1.log" ] && grep -q '^MEAN' "$LOGDIR/$1.log"
}

has_snap() {   # has_snap <output_dir>
    ls -d "$1"/snap_* >/dev/null 2>&1
}

# Resume-aware regressor training (6a pattern: substitute resume='' with
# the latest snapshot so a relaunch continues instead of restarting).
train_arm() {   # train_arm <arm> <last_epoch> <timeout_s>
    local arm=$1 last_epoch=$2 to=$3
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
            echo "=== train_${arm}: resume substitution FAILED"
            NAMES+=("train_${arm}"); RCS+=("RESUME_SUBST_FAILED")
            return
        fi
        step "$to" train_${arm} python scripts/main.py \
            --config "$LOGDIR/${arm}_resume_cfg.py" --output_dir "$out"
    else
        step "$to" train_${arm} python scripts/main.py --config "$cfg"
    fi
}

step 120 tpu_sanity python -c "import jax; ds = jax.devices(); assert ds[0].platform == 'tpu', ds; print(ds)"
if [ "$(rc_of tpu_sanity)" != 0 ]; then
    echo "TPU unreachable — aborting queue"; exit 1
fi

# 1+2. hpo_big training in CHUNKS with an interleaved GT-box ceiling row
#      after each chunk: a session cut mid-train still leaves a
#      measurable, honestly-labeled (epoch-tagged) arm.  The ceiling
#      question needs no detector.  Full train = 60 ep at ~205 s/ep.
BIG=configs/scene_regressor_el0_hpo_big.py
ceiling_big_row() {
    local LAST
    LAST=$(ls -d output/scene_regressor_el0_hpo_big/snap_* 2>/dev/null \
           | sed 's/.*snap_//' | sort -n | tail -1)
    if [ -z "${LAST:-}" ]; then
        echo "=== ceiling_big: no hpo_big snapshot yet, skipping"; return
    fi
    if proto_done "ceiling_big_e${LAST}"; then
        echo "=== ceiling_big_e${LAST} already measured"; return
    fi
    step 2400 "ceiling_big_e${LAST}" \
        python benchmarks/validation/protocol_end_to_end.py \
        --skip_train --reg_config $BIG --gt_boxes --refine_passes 0 \
        --report_dir output/protocol_reports_ceiling_big_e${LAST}
}
train_arm hpo_big 59 2800    # chunk A → ~snap_9
ceiling_big_row
train_arm hpo_big 59 5200    # chunk B → ~snap_29/39
ceiling_big_row
train_arm hpo_big 59 5200    # chunk C → snap_59
ceiling_big_row

# 3. cascade detector (wiped with output/) — chunked like the regressor;
#    --resume auto continues from the latest detector snapshot
train_cascade_chunk() {
    local to=$1
    if [ -d output/detector_cascade/snap_39 ]; then
        echo "=== train_cascade: snap_39 exists, skipping"
        NAMES+=("train_cascade"); RCS+=("0")
        return
    fi
    step "$to" train_cascade python scripts/train_detector.py \
        --config configs/detection/mnv2_ssd_300_scene_cascade.py --resume auto
}

# 4. the pending chain row: hpo_big x cascade+vote, undiluted t=0.05 —
#    runs on the LATEST snapshots of both stages, epoch-tagged, so a
#    partial detector still yields an honestly-labeled row
chain_big_row() {
    local DLAST RLAST
    DLAST=$(ls -d output/detector_cascade/snap_* 2>/dev/null \
            | sed 's/.*snap_//' | sort -n | tail -1)
    RLAST=$(ls -d output/scene_regressor_el0_hpo_big/snap_* 2>/dev/null \
            | sed 's/.*snap_//' | sort -n | tail -1)
    if [ -z "${DLAST:-}" ] || [ -z "${RLAST:-}" ]; then
        echo "=== chain_big: missing detector or regressor snapshot, skipping"
        return
    fi
    local name="chain_big_cv_t05_d${DLAST}_r${RLAST}"
    if proto_done "$name"; then
        echo "=== $name already measured"; return
    fi
    step 2400 "$name" \
        python benchmarks/validation/protocol_end_to_end.py \
        --skip_train --reg_config $BIG \
        --det_dir output/detector_cascade --det_tresh 0.05 --box_vote 0.5 \
        --refine_passes 1 \
        --report_dir output/protocol_reports_${name}
}
train_cascade_chunk 8000
chain_big_row
train_cascade_chunk 8000
chain_big_row
CASC="--det_dir output/detector_cascade --det_tresh 0.05 --box_vote 0.5"

# 5. same-container hpo_s2 pairing arms (optional tail)
train_arm hpo_s2 39 8000
S2=configs/scene_regressor_el0_hpo_s2.py
if has_snap output/scene_regressor_el0_hpo_s2; then
    if proto_done ceiling_s2; then
        echo "=== ceiling_s2 already measured"
    else
        step 3000 ceiling_s2 \
            python benchmarks/validation/protocol_end_to_end.py \
            --skip_train --reg_config $S2 --gt_boxes --refine_passes 0 \
            --report_dir output/protocol_reports_ceiling_s2_6g
    fi
    if [ -d output/detector_cascade/snap_39 ]; then
        if proto_done chain_s2_cv_t05; then
            echo "=== chain_s2_cv_t05 already measured"
        else
            step 3000 chain_s2_cv_t05 \
                python benchmarks/validation/protocol_end_to_end.py \
                --skip_train --reg_config $S2 $CASC --refine_passes 1 \
                --report_dir output/protocol_reports_chain_s2_cv_6g
        fi
    fi
fi

echo
echo "=== queue summary"
for i in "${!NAMES[@]}"; do
    echo "${NAMES[$i]}: rc=${RCS[$i]}"
done
