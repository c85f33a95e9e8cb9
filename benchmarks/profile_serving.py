"""Op-level profile of the fused two-stage SERVING program on the real chip.

Same xplane summarizer as profile_train_step.py, pointed at the batch-N
serving pipeline (engine._pipeline_batch) so serving optimization targets
measured hot spots.

Usage: python benchmarks/profile_serving.py [--batch 32] [--steps 10]
"""

import argparse
import os.path as osp
import sys
import tempfile

sys.path.insert(0, osp.join(osp.dirname(osp.abspath(__file__)), '..'))
sys.path.insert(0, osp.dirname(osp.abspath(__file__)))
sys.path.insert(0, osp.join(osp.dirname(osp.abspath(__file__)), '..',
                            'scripts'))

from tpudet3d.core import enable_compile_cache

enable_compile_cache()

import jax
import jax.numpy as jnp
import numpy as np

from profile_train_step import summarize  # noqa: E402


def capture(batch, steps, refine_passes=0):
    from demo import build_engine
    engine = build_engine('', det_conf=0.0, max_detections=8,
                          refine_passes=refine_passes)
    frames = np.random.randint(0, 255, (batch, 720, 1280, 3)).astype(np.uint8)
    engine.infer_batch(frames)          # compile
    frames_dev = jax.device_put(jnp.asarray(frames))
    out = engine._pipeline_batch(frames_dev, 720, 1280)
    jax.block_until_ready(out)

    logdir = tempfile.mkdtemp(prefix='tpudet3d_serve_prof_')
    with jax.profiler.trace(logdir):
        for _ in range(steps):
            out = engine._pipeline_batch(frames_dev, 720, 1280)
        jax.block_until_ready(out)
    return logdir


if __name__ == '__main__':
    ap = argparse.ArgumentParser()
    ap.add_argument('--batch', type=int, default=32)
    ap.add_argument('--steps', type=int, default=10)
    ap.add_argument('--refine_passes', type=int, default=0)
    ap.add_argument('--top', type=int, default=30)
    ap.add_argument('--raw', action='store_true',
                    help='full per-instruction names with shapes')
    args = ap.parse_args()
    logdir = capture(args.batch, args.steps, args.refine_passes)
    print('trace:', logdir)
    summarize(logdir, top=args.top, raw=args.raw)
