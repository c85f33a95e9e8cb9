"""Serving-throughput sweep over the engine's batched pipeline.

Measures frames/sec of the fused two-stage program (720p → SSD300 → NMS →
crop-resize → regressor) for several frames-per-program batch sizes with
device-resident input, to pick the serving batch for bench.py's headline.

Usage: python benchmarks/server_batch_sweep.py [--batches 8 16 32 64]
"""

import argparse
import os.path as osp
import sys
import time

sys.path.insert(0, osp.join(osp.dirname(osp.abspath(__file__)), '..'))

from tpudet3d.core import enable_compile_cache

enable_compile_cache()

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--batches', type=int, nargs='+',
                    default=[8, 16, 32, 64])
    ap.add_argument('--iters', type=int, default=50)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    sys.path.insert(0, osp.join(osp.dirname(osp.abspath(__file__)), '..',
                                'scripts'))
    from demo import build_engine
    engine = build_engine('', det_conf=0.0, max_detections=8)
    h, w = 720, 1280
    for batch in args.batches:
        frames = np.random.randint(0, 255, (batch, h, w, 3)).astype(np.uint8)
        engine.infer_batch(frames)            # compile this batch size
        frames_dev = jax.device_put(jnp.asarray(frames))
        out = engine._pipeline_batch(frames_dev, h, w)
        jax.block_until_ready(out)
        start = time.perf_counter()
        for _ in range(args.iters):
            out = engine._pipeline_batch(frames_dev, h, w)
        jax.block_until_ready(out)
        dt = time.perf_counter() - start
        fps = batch * args.iters / dt
        print(f'batch {batch:>3}: {fps:10.1f} frames/sec/chip '
              f'({dt / args.iters * 1e3:7.2f} ms/program)', flush=True)


if __name__ == '__main__':
    main()
