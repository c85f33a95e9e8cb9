#!/bin/bash
# TPU queue, phase 2 — stage-2 ceiling experiments (round 3).
# The measured chain is regressor-quality-limited: with IDEAL boxes the
# protocol ceiling is 0.808 AP / 0.665 mean 3D IoU (BASELINE.md), below
# VERDICT r2's 0.67 IoU target.  Three arms attack it:
#   big  — 2x scenes + 1.5x epochs + weight EMA      (capacity of the recipe)
#   wing — big recipe with the reference's WingLoss  (small-residual gradients)
#   r288 — big recipe at 288^2 crops                 (finer localization grid)
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
    timeout 10800 "$@" > "$LOGDIR/$name.log" 2>&1
    local rc=$?
    NAMES+=("$name"); RCS+=("$rc")
    echo "=== $name rc=$rc"
}

step tpu_sanity python -c "import jax; print(jax.devices())"
if [ "${RCS[0]}" != 0 ]; then
    echo "TPU unreachable — aborting queue"; exit 1
fi

for arm in big wing r288; do
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
