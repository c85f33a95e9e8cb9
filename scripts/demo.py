"""Live two-stage 3D-object-detection demo.

Capability parity with the reference demo (scripts/demo.py): video file or
webcam in, tracked 3D boxes drawn out, optional mp4 writer, software-
pipelined inference.  Differences by design: both stages run as ONE fused
XLA program on the TPU (tpudet3d.infer.TwoStageEngine), and the pipelining
(detect frame N while the host draws N−1) is JAX async dispatch instead of
explicit OpenVINO async requests.

Without trained checkpoints the demo runs with random weights (useful for
throughput smoke tests via --benchmark).
"""

import argparse
import os.path as osp
import sys
import time
from dataclasses import asdict

sys.path.insert(0, osp.join(osp.dirname(__file__), '..'))

import numpy as np
import jax

from tpudet3d.core import read_py_config, AttrDict

from tpudet3d.core import enable_compile_cache
enable_compile_cache()
from tpudet3d.infer import TwoStageEngine, EngineConfig, IOUTracker, IOUTrackerConfig
from tpudet3d.models import build_model
from tpudet3d.detect import SSDDetector
from tpudet3d.utils import draw_kp, latest_snapshot, resume_from


def build_engine(reg_config_path, det_checkpoint='', reg_checkpoint='',
                 det_conf=0.7, max_detections=8, host_downscale=1,
                 crop_margin_px=10.0, refine_passes=0, refine_margin_px=10.0,
                 score_thr=0.02, soft_nms_sigma=0.0, soft_nms_dup_iou=0.75,
                 box_vote_iou=0.0, tta_flip=False):
    import jax.numpy as jnp
    if reg_config_path:
        cfg = read_py_config(reg_config_path)
    else:
        cfg = AttrDict(model=dict(name='mobilenetv3_large_21k',
                                  pretrained=False, num_classes=9, bf16=True),
                       output_dir='')
    key = jax.random.PRNGKey(0)

    if det_checkpoint:
        # checkpoint-driven construction: a cascade snapshot instantiates
        # the cascade model automatically (tpudet3d/detect/load.py)
        from tpudet3d.detect import load_detector
        detector, det_vars = load_detector(det_checkpoint,
                                           dtype=jnp.bfloat16)
    else:
        detector = SSDDetector(num_classes=9, dtype=jnp.bfloat16)
        det_vars = jax.jit(detector.init)(
            key, jnp.zeros((1, 300, 300, 3), jnp.float32))

    regressor = build_model(cfg)
    # crop at the regressor's trained input size (configs may deviate from
    # the reference's 224^2, e.g. a 288^2 ceiling experiment)
    crop_size = (tuple(cfg.data.resize) if cfg.get('data')
                 and cfg.data.get('resize') else (224, 224))
    reg_vars = jax.jit(regressor.init)({'params': key, 'dropout': key},
                              jnp.zeros((1, *crop_size, 3), jnp.float32),
                              jnp.zeros((1,), jnp.int32))
    reg_snap = reg_checkpoint or (latest_snapshot(cfg.output_dir)
                                  if cfg.output_dir else None)
    if reg_snap:
        from tpudet3d.train.pipeline import setup_training
        pipe = setup_training(cfg, with_loaders=False)
        state, _ = resume_from(pipe.state, reg_snap)
        from tpudet3d.train.state import eval_params
        reg_vars = {'params': jax.device_get(eval_params(state)),
                    'batch_stats': jax.device_get(state.batch_stats)}
        print(f'loaded regressor weights from {reg_snap}')

    return TwoStageEngine(detector, det_vars, regressor, reg_vars,
                          EngineConfig(crop_size=crop_size,
                                       det_conf=det_conf,
                                       max_detections=max_detections,
                                       host_downscale=host_downscale,
                                       crop_margin_px=crop_margin_px,
                                       refine_passes=refine_passes,
                                       refine_margin_px=refine_margin_px,
                                       score_thr=score_thr,
                                       soft_nms_sigma=soft_nms_sigma,
                                       soft_nms_dup_iou=soft_nms_dup_iou,
                                       box_vote_iou=box_vote_iou,
                                       tta_flip=tta_flip))


def draw_frame(frame, result, tracker):
    import cv2 as cv
    tracker.process(frame, [tuple(map(int, b)) for b in result['boxes']],
                    [kp.reshape(-1) for kp in result['kp']])
    for obj in tracker.get_tracked_objects():
        x0, y0, x1, y1 = map(int, obj.rect[:4])
        color = (0, 255, 0) if obj.label != 'ID -1' else (100, 100, 100)
        cv.rectangle(frame, (x0, y0), (x1, y1), color, 2)
        if obj.label != 'ID -1':
            kp = np.asarray(obj.kp).reshape(9, 2)
            kp_px = kp * np.array([x1 - x0, y1 - y0]) + np.array([x0, y0])
            frame = draw_kp(frame, kp_px, None, RGB=False, normalized=False)
        cv.putText(frame, obj.label, (x0, max(y0 - 5, 12)),
                   cv.FONT_HERSHEY_SIMPLEX, 0.8, (255, 255, 255), 2)
    return frame


def run(capture, engine, tracker, write_video=False, resolution=(1280, 720),
        benchmark=False, max_frames=0):
    import cv2 as cv
    fps_writer = 20
    vout = None
    if write_video:
        vout = cv.VideoWriter('output_video_demo.mp4',
                              cv.VideoWriter_fourcc(*'mp4v'), fps_writer,
                              resolution, True)
    has_frame, prev_frame = capture.read()
    if not has_frame:
        return
    prev_frame = cv.resize(prev_frame, resolution)
    engine.run_async(prev_frame)   # software pipelining: stage N in flight
    n, t0 = 0, time.perf_counter()
    while True:
        has_frame, frame = capture.read()
        if not has_frame or (max_frames and n >= max_frames):
            break
        frame = cv.resize(frame, resolution)
        engine.run_async(frame)             # dispatch frame N first...
        result = engine.wait_and_grab()     # ...then block on frame N-1
        vis = draw_frame(prev_frame, result, tracker)
        if not benchmark:
            cv.imshow('3D-object-detection', vis)
            if cv.waitKey(1) == 27:
                break
        if vout is not None:
            vout.write(vis)
        prev_frame = frame
        n += 1
    elapsed = time.perf_counter() - t0
    print(f'processed {n} frames in {elapsed:.2f}s '
          f'({n / max(elapsed, 1e-9):.1f} fps end-to-end)')
    capture.release()
    if vout is not None:
        vout.release()
    if not benchmark:
        cv.destroyAllWindows()


def main():
    import cv2 as cv
    parser = argparse.ArgumentParser(description='3d object detection live demo')
    parser.add_argument('--video', type=str, default=None)
    parser.add_argument('--cam_id', type=int, default=-1)
    parser.add_argument('--resolution', type=int, nargs='+', default=[1280, 720])
    parser.add_argument('--reg_config', type=str, default='')
    parser.add_argument('--det_checkpoint', type=str, default='')
    parser.add_argument('--reg_checkpoint', type=str, default='')
    parser.add_argument('--det_tresh', type=float, default=0.7)
    parser.add_argument('--write_video', action='store_true')
    parser.add_argument('--benchmark', action='store_true',
                        help='headless throughput mode (no imshow)')
    parser.add_argument('--max_frames', type=int, default=0)
    parser.add_argument('--host_downscale', type=int, default=1,
                        help='downscale frames on host before upload '
                             '(cuts H2D bytes by factor^2; boxes are '
                             'rescaled to source pixels)')
    parser.add_argument('--int8', action='store_true',
                        help='serve both stages through the int8 PTQ path, '
                             'calibrated on the first captured frame')
    parser.add_argument('--tta_flip', action='store_true',
                        help='horizontal-flip TTA for the regressor '
                             '(EngineConfig.tta_flip)')
    args = parser.parse_args()

    if args.cam_id >= 0:
        cap = cv.VideoCapture(args.cam_id)
        cap.set(cv.CAP_PROP_FRAME_WIDTH, args.resolution[0])
        cap.set(cv.CAP_PROP_FRAME_HEIGHT, args.resolution[1])
    else:
        assert args.video, 'No video input was given'
        cap = cv.VideoCapture(args.video)
    assert cap.isOpened()

    engine = build_engine(args.reg_config, args.det_checkpoint,
                          args.reg_checkpoint, det_conf=args.det_tresh,
                          host_downscale=args.host_downscale,
                          tta_flip=args.tta_flip)
    if args.int8:
        from tpudet3d.infer.quant import calibrate_engine
        ok, first = cap.read()
        assert ok, '--int8: could not read a calibration frame'
        ds, rs = calibrate_engine(engine, [cv.resize(first,
                                                     tuple(args.resolution))])
        engine.cfg.det_int8_scales = ds
        engine.cfg.reg_int8_scales = rs
        engine._build_pipelines()
        print(f'int8: calibrated {len(ds)}+{len(rs)} convs')
    tracker = IOUTracker(**asdict(IOUTrackerConfig()))
    run(cap, engine, tracker, args.write_video, tuple(args.resolution),
        benchmark=args.benchmark, max_frames=args.max_frames)


if __name__ == '__main__':
    main()
