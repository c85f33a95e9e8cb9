#!/bin/bash
# TPU queue, phase 5 — round-4 perf/diagnosis program (VERDICT r3 items
# 2,3,4,5).  Runs AFTER the phase-4 accuracy queue (single-tenant TPU);
# every step is checkpoint-free except the HPO study, so order is
# cheap-diagnostics-first:
#   1. streaming decomposition (dispatch vs device; p50/p99 latency)
#   2. serving roofline (XLA cost analysis vs v5e peaks)
#   3. post-bf16 serving op profile (the BASELINE.md table is the *before*)
#   4. windowed-crop end-to-end A/B at batch 32 (measure-or-delete; ran
#      2026-08-19: window LOST -9.6%/-21%, option deleted — the step below
#      is kept commented as the record of how the number was made)
#   5. wing (w, eps) HPO study on the scene-regressor task — the repo's own
#      harness exercised for real (reference scripts/optuna_optim.py:30-31)
#
# Usage: bash benchmarks/run_tpu_queue_phase5.sh [logdir]

set -u
cd "$(dirname "$0")/.."
LOGDIR=${1:-output/tpu_queue5}
mkdir -p "$LOGDIR"
export JAX_COMPILATION_CACHE_DIR=${JAX_COMPILATION_CACHE_DIR:-$PWD/.jax_cache}

step() {
    local name=$1; shift
    echo "=== $name: $* (log: $LOGDIR/$name.log)"
    timeout 16000 "$@" > "$LOGDIR/$name.log" 2>&1
    local rc=$?
    echo "=== $name rc=$rc"
    return $rc
}

# Guard must test step()'s return value — the previous `if [ $? != 0 ]`
# was dead code because step() ended in an echo, so a TPU outage would
# have silently run the whole perf queue on CPU fallback (ADVICE r4).
if ! step tpu_sanity python -c "import jax; ds = jax.devices(); assert ds[0].platform == 'tpu', ds; print(ds)"; then
    echo "TPU unreachable — aborting queue"; exit 1
fi

step probe_streaming python benchmarks/probe_streaming.py
step roofline python benchmarks/roofline_serving.py
step profile_serving python benchmarks/profile_serving.py --batch 32
# step ab_windowed_crop python benchmarks/ab_windowed_crop.py  # (deleted with the option)
step batch_sweep python benchmarks/server_batch_sweep.py --batches 16 32 64 128
step hpo_wing python scripts/optuna_optim.py \
    --config configs/scene_regressor_el0_wing.py \
    -e 6 --n_trials 12 \
    --n_training_iterations 0.5 --n_validate_iterations 1.0

echo "=== phase-5 queue done"
