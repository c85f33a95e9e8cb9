"""End-to-end serving A/B: windowed crop-resize vs full-frame matmul crop.

VERDICT r3 weak #2: the windowed crop path (ops/image.py
crop_and_resize_windowed, EngineConfig.windowed_crop) shipped unmeasured.
The micro-probe (probe_crop.py) already shows the window is NOT faster at
the kernel level on v5e (the full-frame separable matmul crop is tiny);
this measures the decision-grade number — batch-32 serving throughput with
the option on vs off — so the option is either promoted or deleted with a
recorded number (the r2 Pallas-kernel precedent, BASELINE.md).

Usage: python benchmarks/ab_windowed_crop.py  (single-tenant TPU)
"""

import os.path as osp
import statistics
import sys
import time

sys.path.insert(0, osp.join(osp.dirname(osp.abspath(__file__)), '..'))
sys.path.insert(0, osp.join(osp.dirname(osp.abspath(__file__)), '..',
                            'scripts'))

import numpy as np

from tpudet3d.core import enable_compile_cache

enable_compile_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def timed_fps(fn, n_iters=50, repeats=5):
    vals = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        for _ in range(n_iters):
            out = fn()
        jax.block_until_ready(out)
        vals.append(n_iters / (time.perf_counter() - t0))
    return statistics.median(vals), (min(vals), max(vals))


def main(batch=32):
    from demo import build_engine
    print('device:', jax.devices()[0].device_kind)
    engine = build_engine('', det_conf=0.0, max_detections=8)
    h, w = 720, 1280
    frames = np.random.randint(0, 255, (batch, h, w, 3)).astype(np.uint8)
    frames_dev = jax.device_put(jnp.asarray(frames))

    results = {}
    for label, windowed, win in (('full-frame', False, 0),
                                 ('windowed-384', True, 384),
                                 ('windowed-512', True, 512)):
        engine.cfg.windowed_crop = windowed
        engine.cfg.crop_window = win or 384
        engine._build_pipelines()
        jax.block_until_ready(engine._pipeline_batch(frames_dev, h, w))
        med, band = timed_fps(lambda: engine._pipeline_batch(frames_dev, h, w))
        fps = med * batch
        results[label] = fps
        print(f'{label:14s} {fps:8.1f} fps/chip '
              f'(spread {band[0]*batch:.1f}-{band[1]*batch:.1f})')
    base = results['full-frame']
    for label, fps in results.items():
        if label != 'full-frame':
            print(f'{label}: {100*(fps-base)/base:+.1f}% vs full-frame')


if __name__ == '__main__':
    main()
