#!/bin/bash
# TPU queue, phase 6c — round-5 part C (REORDERED mid-round: the cheap,
# highest-value legs run before the multi-hour hpo_big training so a
# round boundary cuts the right tail):
#
#   1. roofline A/B after the crop-stage bytes cut (VERDICT r4 item 6):
#      ops/image.py now picks the contraction order that minimizes the
#      half-resized intermediate AND stores it in the compute dtype
#      (bf16).  Compare fps + %HBM-peak to the round-4 row (3,043.5 fps,
#      62.3% of 819 GB/s).  (First attempt crashed on the pre-fix probe;
#      the done-log gate re-runs it with the fixed code.)
#   2. fresh serving profile for the bytes attribution post-change
#      (already measured by the pulled-forward chain leg — gate skips).
#   3. NEW chain arms on the best 6b cell (cascade + vote 0.5): does a
#      second refine pass / flip-TTA / tighter refine margin close the
#      remaining 0.655 -> 0.67 undiluted-chain gap? (VERDICT r4 item 1 —
#      the round's #1 item; ceiling is 0.693 on this container.)
#   4. hpo_big (VERDICT r4 item 2): 2x-scenes/60-epoch/EMA on the
#      winning HPO loss — train (resume-aware) + chain protocol row.
#   5. bench.py on the final tree.
#
# Single-tenant TPU: run alone, after phases 6a/6b.
#
# Usage: bash benchmarks/run_tpu_queue_phase6c.sh [logdir]

set -u
cd "$(dirname "$0")/.."
LOGDIR=${1:-output/tpu_queue6c}
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

done_log() {
    [ -s "$LOGDIR/$1.log" ] && grep -q "$2" "$LOGDIR/$1.log"
}

step tpu_sanity python -c "import jax; ds = jax.devices(); assert ds[0].platform == 'tpu', ds; print(ds)"
if [ "$(rc_of tpu_sanity)" != 0 ]; then
    echo "TPU unreachable — aborting queue"; exit 1
fi

# 1. serving roofline A/B (weights are random-init: same program shape,
#    pure perf measurement — matches how the round-4 row was produced)
if done_log roofline_ab 'HBM peak'; then
    echo "=== roofline_ab: already measured, skipping"
    NAMES+=("roofline_ab"); RCS+=("0")
else
    step roofline_ab python benchmarks/roofline_serving.py --batch 32
fi

# 2. fresh op-level profile for the post-change bytes attribution
if done_log profile_serving 'TOTAL\|total'; then
    echo "=== profile_serving: already measured, skipping"
    NAMES+=("profile_serving"); RCS+=("0")
else
    step profile_serving python benchmarks/profile_serving.py
fi

# 2b. phase-6d's two cheap probes, pulled FORWARD (the raw instruction
#     attribution gates the round's last perf lever — running it here
#     instead of after the multi-hour hpo_big leg buys hours of lead
#     time).  Written to phase-6d's OWN logdir so its done-log gates
#     skip them when that queue fires.
LOG6D=output/tpu_queue6d
mkdir -p "$LOG6D"
if [ -s "$LOG6D/profile_serving_raw.log" ] && grep -qi 'total' "$LOG6D/profile_serving_raw.log"; then
    echo "=== profile_serving_raw: already measured, skipping"
    NAMES+=("profile_serving_raw"); RCS+=("0")
else
    echo "=== profile_serving_raw (log: $LOG6D/profile_serving_raw.log)"
    timeout 3000 python benchmarks/profile_serving.py --raw --top 60 \
        > "$LOG6D/profile_serving_raw.log" 2>&1
    rc=$?; NAMES+=("profile_serving_raw"); RCS+=("$rc")
    echo "=== profile_serving_raw rc=$rc"
fi
if [ -s "$LOG6D/roofline_b64.log" ] && grep -q 'HBM peak' "$LOG6D/roofline_b64.log"; then
    echo "=== roofline_b64: already measured, skipping"
    NAMES+=("roofline_b64"); RCS+=("0")
else
    echo "=== roofline_b64 (log: $LOG6D/roofline_b64.log)"
    timeout 3000 python benchmarks/roofline_serving.py --batch 64 \
        > "$LOG6D/roofline_b64.log" 2>&1
    rc=$?; NAMES+=("roofline_b64"); RCS+=("$rc")
    echo "=== roofline_b64 rc=$rc"
fi

# 3. chain arms on the best 6b cell: cascade detector + box vote 0.5,
#    undiluted hard-NMS t=0.05, hpo_s2 regressor — one extra lever each
REG=configs/scene_regressor_el0_hpo_s2.py
CASC="--det_dir output/detector_cascade --det_tresh 0.05 --box_vote 0.5"
chain() {
    local name=$1; shift
    if done_log "$name" '^MEAN'; then
        echo "=== $name: already measured, skipping"
        NAMES+=("$name"); RCS+=("0"); return
    fi
    step "$name" python benchmarks/validation/protocol_end_to_end.py \
        --skip_train --reg_config $REG $CASC "$@"
}
chain chain_cv_refine2_t05 --refine_passes 2 \
    --report_dir output/protocol_reports_chain_cv_refine2
chain chain_cv_tta_t05 --refine_passes 1 --tta_flip \
    --report_dir output/protocol_reports_chain_cv_tta
chain chain_cv_r2tta_t05 --refine_passes 2 --tta_flip \
    --report_dir output/protocol_reports_chain_cv_r2tta
chain chain_cv_margin6_t05 --refine_passes 1 --refine_margin 6 \
    --report_dir output/protocol_reports_chain_cv_margin6

# 3b. opportunistic hook: if a pre-hpo_big measurement script exists by
#     the time the queue reaches this point (e.g. a pallas-preproc A/B
#     built while the arms ran), execute it now instead of after the
#     multi-hour training leg.  Absent file = skipped, zero cost.
if [ -f benchmarks/hook_pre_hpo_big.sh ]; then
    echo "=== hook_pre_hpo_big (log: $LOGDIR/hook_pre_hpo_big.log)"
    timeout 3000 bash benchmarks/hook_pre_hpo_big.sh \
        > "$LOGDIR/hook_pre_hpo_big.log" 2>&1
    rc=$?; NAMES+=("hook_pre_hpo_big"); RCS+=("$rc")
    echo "=== hook_pre_hpo_big rc=$rc"
else
    echo "=== hook_pre_hpo_big: no hook present, skipping"
fi

# 4. hpo_big: train (resume-aware) + protocol row
train_hpo_big() {
    local cfg=configs/scene_regressor_el0_hpo_big.py
    local out=output/scene_regressor_el0_hpo_big
    if [ -d "${out}/snap_59" ]; then
        echo "=== train_hpo_big: snap_59 exists, skipping"
        NAMES+=("train_hpo_big"); RCS+=("0")
        return
    fi
    local LAST
    LAST=$(ls -d ${out}/snap_* 2>/dev/null | sed 's/.*snap_//' | sort -n | tail -1)
    if [ -n "${LAST:-}" ]; then
        sed -e "s#resume=''#resume='./${out}/snap_${LAST}'#" \
            "$cfg" > "$LOGDIR/hpo_big_resume_cfg.py"
        if ! grep -q "snap_${LAST}" "$LOGDIR/hpo_big_resume_cfg.py"; then
            echo "=== train_hpo_big: resume substitution FAILED"
            NAMES+=("train_hpo_big"); RCS+=("RESUME_SUBST_FAILED")
            return
        fi
        step train_hpo_big python scripts/main.py \
            --config "$LOGDIR/hpo_big_resume_cfg.py" --output_dir "$out"
    else
        step train_hpo_big python scripts/main.py --config "$cfg"
    fi
}
train_hpo_big
if [ "$(rc_of train_hpo_big)" = 0 ]; then
    if done_log proto_hpo_big '^MEAN'; then
        echo "=== proto_hpo_big: already measured, skipping"
        NAMES+=("proto_hpo_big"); RCS+=("0")
    else
        step proto_hpo_big python benchmarks/validation/protocol_end_to_end.py \
            --skip_train --reg_config configs/scene_regressor_el0_hpo_big.py \
            --refine_passes 1 --det_tresh 0.01 --det_score_thr 0.005 \
            --soft_nms 0.5 --soft_nms_dup 0.75 \
            --report_dir output/protocol_reports_hpo_big
    fi
else
    skip_step proto_hpo_big "train_hpo_big rc=$(rc_of train_hpo_big)"
fi

# 5. bench on the final tree
step bench_final python bench.py

echo
echo "=== queue summary"
for i in "${!NAMES[@]}"; do
    echo "${NAMES[$i]}: rc=${RCS[$i]}"
done
