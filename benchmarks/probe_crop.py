"""Crop-stage probe: full-frame separable-matmul crop vs the windowed
variant (ops/image.py crop_and_resize_windowed) at the serving shape.

The fused batch-32 serving program spends ~1.6 ms in crop matmuls
(DEVELOPMENT.md round-3 notes): the full-frame formulation contracts
224×H and 224×W interpolation matrices that carry ≤2 nonzeros per row
(~1.65 GFLOP/crop at 720p, mostly zeros).  The windowed variant slices a
static win² window per box first (~0.5 GFLOP/crop at win=512).  The open
risk is the vmapped ``lax.dynamic_slice`` (it lowers to a batched window
gather) — round 1 measured per-PIXEL gathers 100× slower than matmuls;
window gathers move 786 KB contiguous per crop and should DMA, but this
probe is the measurement.

Run on the real chip (single-tenant: not while the TPU queue is up).
"""

import os.path as osp
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, osp.join(osp.dirname(osp.abspath(__file__)), '..'))

from tpudet3d.ops.image import crop_and_resize, crop_and_resize_windowed

B, K = 32, 8                      # serving batch: 32 frames × 8 boxes
H, W = 720, 1280


def timed(fn, *args, iters=30):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    print(f'device: {jax.devices()[0]}')
    rng = np.random.default_rng(0)
    frames = jnp.asarray(rng.integers(0, 255, (B, H, W, 3)), jnp.uint8)
    # detector-like boxes: mostly 80-400 px, a couple oversized per batch
    wh = rng.uniform(80, 400, (B, K, 2))
    wh[:, -1] = rng.uniform(500, 700, (B, 2))      # one oversized box/frame
    x0 = rng.uniform(0, 1, (B, K)) * (W - wh[..., 0])
    y0 = rng.uniform(0, 1, (B, K)) * (H - wh[..., 1])
    boxes = jnp.asarray(
        np.stack([x0, y0, x0 + wh[..., 0], y0 + wh[..., 1]], -1), jnp.float32)

    full = jax.jit(jax.vmap(
        lambda f, b: crop_and_resize(f, b, (224, 224))))

    t = timed(full, frames, boxes)
    print(f'full-frame matmul crop      {t*1e3:7.2f} ms/batch '
          f'({B*K/t:8.0f} crops/s)')

    for win in (384, 512):
        fn = jax.jit(jax.vmap(
            lambda f, b, _w=win: crop_and_resize_windowed(
                f, b, (224, 224), win=_w)))
        t = timed(fn, frames, boxes)
        print(f'windowed crop (win={win})    {t*1e3:7.2f} ms/batch '
              f'({B*K/t:8.0f} crops/s)')

    # numerical check at the serving dtype (bf16): fitting boxes only
    small_boxes = jnp.asarray(
        np.stack([x0[:, :4], y0[:, :4],
                  x0[:, :4] + np.minimum(wh[:, :4, 0], 300),
                  y0[:, :4] + np.minimum(wh[:, :4, 1], 300)], -1),
        jnp.float32)
    a = np.asarray(jax.vmap(
        lambda f, b: crop_and_resize(f, b, (224, 224)))(
            frames, small_boxes), np.float32)
    w = np.asarray(jax.vmap(
        lambda f, b: crop_and_resize_windowed(f, b, (224, 224)))(
            frames, small_boxes), np.float32)
    print(f'bf16 max |full - windowed| on fitting boxes: '
          f'{np.abs(a - w).max():.3f} gray levels')


if __name__ == '__main__':
    main()
