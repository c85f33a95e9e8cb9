#!/bin/bash
# TPU queue, phase 6e — round-5 tail: the one arm the 6c ordering could
# not express: the undiluted hard-NMS t=0.05 chain with the *hpo_big*
# regressor (snap_59 does not exist until 6c's training leg finishes)
# on the best stage-1 cell (cascade + box-vote 0.5).
#
# Motivation: every inference-side lever on the hpo_s2 regressor is now
# measured ≤0 (refine2 −0.004, tta −0.008, margin6/r2tta in 6c logs);
# the only remaining path to the 0.67 undiluted-chain target is a
# better stage-2 — exactly what the 2×-scenes/60-epoch/EMA hpo_big
# recipe trains.  Also a ceiling row (GT boxes) for the same regressor
# so the chain/ceiling ratio stays comparable.
#
# Usage: bash benchmarks/run_tpu_queue_phase6e.sh [wait_pid]

set -u
cd "$(dirname "$0")/.."
PID=${1:-}
if [ -n "$PID" ]; then
    echo "waiting for pid $PID ..."
    while kill -0 "$PID" 2>/dev/null; do sleep 30; done
    echo "pid $PID exited"
fi
export JAX_COMPILATION_CACHE_DIR=${JAX_COMPILATION_CACHE_DIR:-$PWD/.jax_cache}

LOGDIR=output/tpu_queue6e
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
done_log() {
    [ -s "$LOGDIR/$1.log" ] && grep -q "$2" "$LOGDIR/$1.log"
}

step tpu_sanity python -c "import jax; ds = jax.devices(); assert ds[0].platform == 'tpu', ds; print(ds)"
if [ "${RCS[0]}" != 0 ]; then echo "TPU unreachable — aborting"; exit 1; fi

if [ ! -d output/scene_regressor_el0_hpo_big/snap_59 ]; then
    echo "hpo_big snap_59 missing — 6c training did not finish; nothing to do"
    exit 0
fi

REG=configs/scene_regressor_el0_hpo_big.py
CASC="--det_dir output/detector_cascade --det_tresh 0.05 --box_vote 0.5"
chain() {
    local name=$1; shift
    if done_log "$name" '^MEAN'; then
        echo "=== $name: already measured, skipping"
        NAMES+=("$name"); RCS+=("0"); return
    fi
    step "$name" python benchmarks/validation/protocol_end_to_end.py \
        --skip_train --reg_config $REG "$@"
}
chain chain_big_cv_t05 $CASC --refine_passes 1 \
    --report_dir output/protocol_reports_chain_big_cv
chain ceiling_big --gt_boxes --refine_passes 0 \
    --report_dir output/protocol_reports_ceiling_big

echo
echo "=== queue summary"
for i in "${!NAMES[@]}"; do
    echo "${NAMES[$i]}: rc=${RCS[$i]}"
done
