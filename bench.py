"""Headline benchmark: end-to-end TWO-STAGE pipeline throughput on TPU vs
the reference-style PyTorch-CPU serial path.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Pipeline under test: 720p uint8 BGR frame → (resize 300, /255) → MNv2-SSD
forward → anchor decode + NMS → batched crop-resize (MXU) → MobileNetV3
multi-head regressor (bf16) → head select — ONE fused XLA program, async
double-buffered (tpudet3d.infer.TwoStageEngine).

Baseline (measured once, cached in BASELINE_MEASURED.json): the reference
deployment shape on torch CPU — SSD forward per frame + ONE regressor
forward per detection, serial, batch 1 (torchdet3d/utils/ie_wrappers.py:
48,61,128-136; demo assumes ~2 objects per frame).
"""

import json
import os
import os.path as osp
import sys
import time

sys.path.insert(0, osp.dirname(osp.abspath(__file__)))

import numpy as np

from tpudet3d.core import enable_compile_cache

enable_compile_cache()

BASELINE_FILE = osp.join(osp.dirname(osp.abspath(__file__)),
                         'BASELINE_MEASURED.json')
FRAME_SHAPE = (720, 1280, 3)
DETS_PER_FRAME = 2


def measure_torch_baseline(n_frames=8):
    """Reference-style serial two-stage CPU inference, frames/sec."""
    import torch
    from benchmarks.torch_baseline import (TorchRegressorBaseline,
                                           TorchSSDBaseline)
    torch.set_num_threads(os.cpu_count() or 1)
    det = TorchSSDBaseline().eval()
    reg = TorchRegressorBaseline().eval()
    frame300 = torch.rand(1, 3, 300, 300)
    crop224 = torch.rand(1, 3, 224, 224)
    with torch.no_grad():
        det(frame300)
        reg(crop224)
        start = time.perf_counter()
        for _ in range(n_frames):
            det(frame300)
            for _ in range(DETS_PER_FRAME):
                reg(crop224)
        elapsed = time.perf_counter() - start
    return n_frames / elapsed


def get_baseline():
    if osp.exists(BASELINE_FILE):
        with open(BASELINE_FILE) as f:
            data = json.load(f)
        if 'torch_cpu_two_stage_fps' in data:
            return data
    data = {'torch_cpu_two_stage_fps': measure_torch_baseline(),
            'note': 'reference-style serial two-stage torch-CPU pipeline '
                    '(SSD300 + per-detection regressor, batch 1, '
                    f'{DETS_PER_FRAME} detections/frame — the reference '
                    'deploys via OpenVINO CPU batch 1, ie_wrappers.py:61)'}
    with open(BASELINE_FILE, 'w') as f:
        json.dump(data, f, indent=1)
    return data


def measure_tpu(n_iters=50, server_batch=32):
    """Returns (server_fps, streaming_fps, host_included_fps).

    server: N frames per program (batched SSD + batched crops/regressor) —
    peak sustainable serving throughput with device-resident input.
    streaming: one frame per program, chained (latency-oriented).
    host_included: plus the H2D upload.  NOTE: this environment reaches the
    TPU through a ~41 MB/s relay tunnel (65 ms per 720p frame), which is an
    artifact of the harness, not of the design — on a co-located host the
    upload is ~1 ms over PCIe.
    """
    import jax
    import jax.numpy as jnp
    sys.path.insert(0, osp.join(osp.dirname(osp.abspath(__file__)), 'scripts'))
    from demo import build_engine
    engine = build_engine('', det_conf=0.0,
                          max_detections=max(DETS_PER_FRAME, 8))
    frame = np.random.randint(0, 255, FRAME_SHAPE).astype(np.uint8)
    engine(frame)                      # compile single-frame path
    h, w = FRAME_SHAPE[:2]

    # server mode: batched frames, device-resident
    frames = np.random.randint(0, 255, (server_batch, *FRAME_SHAPE)) \
        .astype(np.uint8)
    engine.infer_batch(frames)         # compile batched path
    frames_dev = jax.device_put(jnp.asarray(frames))
    out = engine._pipeline_batch(frames_dev, h, w)
    jax.block_until_ready(out)
    start = time.perf_counter()
    for _ in range(n_iters):
        out = engine._pipeline_batch(frames_dev, h, w)
    jax.block_until_ready(out)
    server_fps = server_batch * n_iters / (time.perf_counter() - start)

    # streaming: single frame chained
    frame_dev = jax.device_put(frame)
    out = engine._pipeline(frame_dev, h, w)
    jax.block_until_ready(out)
    start = time.perf_counter()
    for _ in range(n_iters):
        out = engine._pipeline(frame_dev, h, w)
    jax.block_until_ready(out)
    streaming_fps = n_iters / (time.perf_counter() - start)

    engine.run_async(frame)            # warm async host path
    start = time.perf_counter()
    for _ in range(n_iters):
        engine.wait_and_grab()
        engine.run_async(frame)
    engine.wait_and_grab()
    host_fps = (n_iters + 1) / (time.perf_counter() - start)

    # host-downscale mode: 720p → 360p on host (cv2) before upload — 4×
    # fewer tunnel bytes; detector input is 300² anyway and the crops
    # tolerate 360p (VERDICT r1 item 8)
    engine.cfg.host_downscale = 2
    engine.run_async(frame)            # compiles the 360p program
    engine.wait_and_grab()
    engine.run_async(frame)
    start = time.perf_counter()
    for _ in range(n_iters):
        engine.wait_and_grab()
        engine.run_async(frame)
    engine.wait_and_grab()
    host_ds_fps = (n_iters + 1) / (time.perf_counter() - start)
    engine.cfg.host_downscale = 1
    return server_fps, streaming_fps, host_fps, host_ds_fps


def main():
    baseline = get_baseline()
    server_fps, streaming_fps, host_fps, host_ds_fps = measure_tpu()
    base_fps = baseline['torch_cpu_two_stage_fps']
    print(json.dumps({
        'metric': 'two-stage pipeline frames/sec (720p, SSD300 + 3D regressor, batch-32 serving, device-resident input)',
        'value': round(server_fps, 2),
        'unit': 'frames/sec/chip',
        'vs_baseline': round(server_fps / base_fps, 2),
        'streaming_single_frame_fps': round(streaming_fps, 2),
        'host_included_fps_via_41MBps_tunnel': round(host_fps, 2),
        'host_included_downscale2_fps': round(host_ds_fps, 2),
        'torch_cpu_baseline_fps': round(base_fps, 3),
    }))


if __name__ == '__main__':
    main()
