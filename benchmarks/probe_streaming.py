"""Streaming (single-frame) leg diagnosis — VERDICT r3 weak #4.

The streaming number regressed 648 fps (r01) → 539 fps (r03, spread
492-634) with no single-frame code change.  This probe decomposes the
per-frame time into the three candidate costs so the number is explained
rather than re-measured:

  1. host DISPATCH cost per call (time to enqueue n programs, no block) —
     through the axon relay each dispatch crosses the tunnel;
  2. sustained CHAINED rate (dispatch n, block once) — min(device rate,
     dispatch rate); comparing with (1) attributes the bottleneck;
  3. BLOCKED per-call latency p50/p99 (dispatch + execute + sync per frame)
     — the number a latency SLO would quote;
  4. micro-batch frontier b ∈ {1,2,4,8}: latency vs throughput when a
     stream is allowed to carry b frames per program.

Usage: python benchmarks/probe_streaming.py  (single-tenant TPU)
"""

import os.path as osp
import sys
import time

sys.path.insert(0, osp.join(osp.dirname(__file__), '..'))

import numpy as np

from tpudet3d.core import enable_compile_cache

enable_compile_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

FRAME_SHAPE = (720, 1280, 3)


def main(n=200):
    sys.path.insert(0, osp.join(osp.dirname(__file__), '..', 'scripts'))
    from demo import build_engine
    print('device:', jax.devices()[0].device_kind)
    engine = build_engine('', det_conf=0.0, max_detections=8)
    h, w = FRAME_SHAPE[:2]
    frame = np.random.randint(0, 255, FRAME_SHAPE).astype(np.uint8)
    frame_dev = jax.device_put(jnp.asarray(frame))
    jax.block_until_ready(engine._pipeline(frame_dev, h, w))  # compile

    # 1. dispatch-only cost (no block until the very end of timing)
    for _ in range(10):
        out = engine._pipeline(frame_dev, h, w)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    outs = [engine._pipeline(frame_dev, h, w) for _ in range(n)]
    t_dispatch = (time.perf_counter() - t0) / n
    t0 = time.perf_counter()
    jax.block_until_ready(outs[-1])
    t_drain = time.perf_counter() - t0

    # 2. chained rate (the bench streaming leg)
    t0 = time.perf_counter()
    for _ in range(n):
        out = engine._pipeline(frame_dev, h, w)
    jax.block_until_ready(out)
    t_chained = (time.perf_counter() - t0) / n

    # 3. blocked per-call latency
    lat = []
    for _ in range(n):
        t0 = time.perf_counter()
        jax.block_until_ready(engine._pipeline(frame_dev, h, w))
        lat.append(time.perf_counter() - t0)
    lat_ms = np.asarray(lat) * 1e3
    p50, p90, p99 = np.percentile(lat_ms, [50, 90, 99])

    print(f'dispatch-only      {t_dispatch*1e3:7.3f} ms/call '
          f'({1/t_dispatch:7.1f} calls/s)  drain after {n}: {t_drain*1e3:.1f} ms')
    print(f'chained (bench)    {t_chained*1e3:7.3f} ms/frame '
          f'({1/t_chained:7.1f} fps)')
    print(f'blocked latency    p50 {p50:6.2f}  p90 {p90:6.2f}  '
          f'p99 {p99:6.2f} ms')
    dev_est = max(t_chained - t_dispatch, 0)
    bound = ('HOST-DISPATCH-bound' if t_dispatch > 0.8 * t_chained
             else 'DEVICE-bound')
    print(f'attribution: chained leg is {bound} '
          f'(dispatch {t_dispatch*1e3:.2f} ms vs chained {t_chained*1e3:.2f} '
          f'ms; device-execute residual ≈ {dev_est*1e3:.2f} ms)')

    # 4. micro-batch frontier
    print('\nmicro-batch frontier (latency vs throughput):')
    for b in (1, 2, 4, 8, 16):
        frames = np.random.randint(0, 255, (b, *FRAME_SHAPE)).astype(np.uint8)
        fdev = jax.device_put(jnp.asarray(frames))
        jax.block_until_ready(engine._pipeline_batch(fdev, h, w))
        lat = []
        for _ in range(max(n // b, 30)):
            t0 = time.perf_counter()
            jax.block_until_ready(engine._pipeline_batch(fdev, h, w))
            lat.append(time.perf_counter() - t0)
        lm = np.asarray(lat) * 1e3
        print(f'  b={b:2d}  blocked p50 {np.percentile(lm, 50):7.2f} ms '
              f'({b/np.percentile(lm, 50)*1e3:7.1f} fps)  '
              f'p99 {np.percentile(lm, 99):7.2f} ms')


if __name__ == '__main__':
    main()
