#!/bin/bash
# TPU queue, phase 6f — consolidated round-5 tail (replaces the separate
# 6d/6e waiters so the wedge-prone probes get SHORT timeouts and the
# high-value hpo_big chain arm runs first):
#
#   1. hpo_big × (cascade + vote 0.5) undiluted hard-NMS t=0.05 chain +
#      matching GT-box ceiling row — the only remaining path to the 0.67
#      target now that every inference-side lever on hpo_s2 measured ≤0.
#   2. raw per-instruction serving profile (retry; first attempt wedged
#      in an axon ep_poll hang and was killed) — 900 s cap.
#   3. batch-64 roofline point (same story) — 900 s cap.
#
# Usage: bash benchmarks/run_tpu_queue_phase6f.sh [chain_pid]

set -u
cd "$(dirname "$0")/.."
PID=${1:-}
if [ -n "$PID" ]; then
    echo "waiting for chain pid $PID ..."
    while kill -0 "$PID" 2>/dev/null; do sleep 30; done
    echo "chain exited"
fi
export JAX_COMPILATION_CACHE_DIR=${JAX_COMPILATION_CACHE_DIR:-$PWD/.jax_cache}

LOGDIR=output/tpu_queue6e
LOG6D=output/tpu_queue6d
mkdir -p "$LOGDIR" "$LOG6D"

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
done_log() {
    [ -s "$1" ] && grep -q "$2" "$1"
}

step 120 tpu_sanity python -c "import jax; ds = jax.devices(); assert ds[0].platform == 'tpu', ds; print(ds)"
if [ "${RCS[0]}" != 0 ]; then echo "TPU unreachable — aborting"; exit 1; fi

# 1. hpo_big chain arm — any snapshot counts (objectron_eval resolves the
#    LATEST snapshot from the config's output_dir, so a timeout-cut
#    training still yields a measurable, honestly-labeled arm)
if ls -d output/scene_regressor_el0_hpo_big/snap_* >/dev/null 2>&1; then
    echo "hpo_big latest snapshot: $(ls -d output/scene_regressor_el0_hpo_big/snap_* | sed 's/.*snap_//' | sort -n | tail -1)"
    REG=configs/scene_regressor_el0_hpo_big.py
    CASC="--det_dir output/detector_cascade --det_tresh 0.05 --box_vote 0.5"
    if done_log "$LOGDIR/chain_big_cv_t05.log" '^MEAN'; then
        echo "=== chain_big_cv_t05 already measured"
    else
        step 3000 chain_big_cv_t05 \
            python benchmarks/validation/protocol_end_to_end.py \
            --skip_train --reg_config $REG $CASC --refine_passes 1 \
            --report_dir output/protocol_reports_chain_big_cv
    fi
    if done_log "$LOGDIR/ceiling_big.log" '^MEAN'; then
        echo "=== ceiling_big already measured"
    else
        step 3000 ceiling_big \
            python benchmarks/validation/protocol_end_to_end.py \
            --skip_train --reg_config $REG --gt_boxes --refine_passes 0 \
            --report_dir output/protocol_reports_ceiling_big
    fi
else
    echo "hpo_big has no snapshots — skipping the chain arm"
fi

# 2. raw profile retry (short cap — wedge-prone)
if done_log "$LOG6D/profile_serving_raw.log" 'total'; then
    echo "=== profile_serving_raw already measured"
else
    step 900 profile_serving_raw \
        python benchmarks/profile_serving.py --raw --top 60
    cp "$LOGDIR/profile_serving_raw.log" "$LOG6D/profile_serving_raw.log" 2>/dev/null
fi

# 3. batch-64 roofline retry (short cap)
if done_log "$LOG6D/roofline_b64.log" 'HBM peak'; then
    echo "=== roofline_b64 already measured"
else
    step 900 roofline_b64 python benchmarks/roofline_serving.py --batch 64
    cp "$LOGDIR/roofline_b64.log" "$LOG6D/roofline_b64.log" 2>/dev/null
fi

echo
echo "=== queue summary"
for i in "${!NAMES[@]}"; do
    echo "${NAMES[$i]}: rc=${RCS[$i]}"
done
