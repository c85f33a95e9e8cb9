#!/bin/bash
# TPU queue, phase 2 — finish the el0 baseline + stage-2 ceiling arms.
# The measured chain is regressor-quality-limited: with IDEAL boxes the
# protocol ceiling is 0.808 AP / 0.665 mean 3D IoU (BASELINE.md), below
# VERDICT r2's 0.67 IoU target.  Arms (one variable each vs el0):
#   big  — 2x scenes + 1.5x epochs + weight EMA      (recipe scaling)
#   wing — reference WingLoss at its HPO-tuned w/eps (loss)
#   r288 — 288^2 crops                               (localization grid)
# Each arm: train → GT-box ceiling → deployed chain at the miss-recovery
# operating point.  Single-tenant TPU: run AFTER run_tpu_queue.sh.
#
# Usage: bash benchmarks/run_tpu_queue_phase2.sh [logdir]

set -u
cd "$(dirname "$0")/.."
LOGDIR=${1:-output/tpu_queue2}
mkdir -p "$LOGDIR"
export JAX_COMPILATION_CACHE_DIR=${JAX_COMPILATION_CACHE_DIR:-$PWD/.jax_cache}

declare -a NAMES RCS

step() {
    local name=$1; shift
    echo "=== $name: $* (log: $LOGDIR/$name.log)"
    timeout 14400 "$@" > "$LOGDIR/$name.log" 2>&1
    local rc=$?
    NAMES+=("$name"); RCS+=("$rc")
    echo "=== $name rc=$rc"
}

step tpu_sanity python -c "import jax; print(jax.devices())"
if [ "${RCS[0]}" != 0 ]; then
    echo "TPU unreachable — aborting queue"; exit 1
fi

# 0. finish the el0 baseline if phase 1's 1h step budget truncated it
# (rc=124 at ~epoch 27 of 40 on a contended host), then re-measure the
# headline chain with the completed snapshot.
LAST=$(ls -d output/scene_regressor_el0/snap_* 2>/dev/null | sed 's/.*snap_//' | sort -n | tail -1)
if [ -n "${LAST}" ] && [ "${LAST}" -lt 39 ]; then
    sed -e "s#resume=''#resume='./output/scene_regressor_el0/snap_${LAST}'#" \
        configs/scene_regressor_el0.py > "$LOGDIR/el0_resume_cfg.py"
    step resume_el0 python scripts/main.py --config "$LOGDIR/el0_resume_cfg.py" \
        --output_dir output/scene_regressor_el0
fi
step proto_el0 python benchmarks/validation/protocol_end_to_end.py \
    --skip_train --reg_config configs/scene_regressor_el0.py \
    --refine_passes 1 --det_tresh 0.01 --det_score_thr 0.005 \
    --soft_nms 0.5 --soft_nms_dup 0.75 \
    --report_dir output/protocol_reports_el0_full

# 1. fixed int8 probe (conv shapes; phase 1 crashed on a kwarg bug)
step probe_int8 python benchmarks/probe_int8.py

# 2. ceiling arms
for arm in wing r288 big; do
    cfg=configs/scene_regressor_el0_${arm}.py
    out=output/scene_regressor_el0_${arm}
    if ! ls -d ${out}/snap_* >/dev/null 2>&1; then
        step train_${arm} python scripts/main.py --config ${cfg}
    fi
    # stage-2+protocol ceiling with IDEAL GT-extent+10 boxes (diagnostic)
    step ceiling_${arm} python benchmarks/validation/protocol_end_to_end.py \
        --skip_train --reg_config ${cfg} --gt_boxes \
        --report_dir output/protocol_reports_ceiling_${arm}
    # deployed chain at the measured miss-recovery operating point
    step proto_${arm} python benchmarks/validation/protocol_end_to_end.py \
        --skip_train --reg_config ${cfg} \
        --refine_passes 1 --det_tresh 0.01 --det_score_thr 0.005 \
        --soft_nms 0.5 --soft_nms_dup 0.75 \
        --report_dir output/protocol_reports_${arm}
done

echo
echo "=== queue summary"
for i in "${!NAMES[@]}"; do
    echo "${NAMES[$i]}: rc=${RCS[$i]}"
done
