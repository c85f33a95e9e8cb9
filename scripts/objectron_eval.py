"""Official Objectron-protocol evaluation over TFRecord shards.

Capability parity with the reference (scripts/objectron_eval.py): walks
per-class TFRecord shards, runs the two-stage pipeline on each image,
re-scales predicted boxes with the ground plane, and accumulates the full
AP report (3D IoU / 2D pixel / azimuth / polar / ADD / ADDS).

Differences by design: the two stages run as one fused XLA program
(tpudet3d.infer.TwoStageEngine), EPnP lifting is batched on device, and the
TFRecord + tf.train.Example parsing is a pure-python reader
(tpudet3d.eval.protocol) — no TensorFlow dependency.

Expected feature keys (Objectron eval shards): image/encoded (JPEG),
point_2d, point_3d (flat float lists), instance_num, object/visibility,
plane/center, plane/normal.
"""

import argparse
import glob
import os.path as osp
import sys

sys.path.insert(0, osp.join(osp.dirname(__file__), '..'))

import numpy as np

from tpudet3d.core import OBJECTRON_CLASSES, mkdir_if_missing

from tpudet3d.core import enable_compile_cache
enable_compile_cache()
from tpudet3d.eval.protocol import (ObjectronProtocolEvaluator, read_tfrecord,
                                    parse_example)
from tpudet3d.ops.geometry import lift_2d_batched


def decode_example(payload):
    import cv2 as cv
    feats = parse_example(payload)
    img_bytes = feats.get('image/encoded', {}).get('bytes', [None])[0]
    image = None
    if img_bytes is not None:
        image = cv.imdecode(np.frombuffer(img_bytes, np.uint8),
                            cv.IMREAD_COLOR)
    n = int(feats.get('instance_num', {}).get('ints', [0])[0])
    p2 = np.asarray(feats.get('point_2d', {}).get('floats', []),
                    np.float32).reshape(n, 9, 3)[..., :2] if n else \
        np.zeros((0, 9, 2), np.float32)
    p3 = np.asarray(feats.get('point_3d', {}).get('floats', []),
                    np.float32).reshape(n, 9, 3) if n else \
        np.zeros((0, 9, 3), np.float32)
    vis = np.asarray(feats.get('object/visibility', {}).get('floats', []),
                     np.float32)
    plane_c = np.asarray(feats.get('plane/center', {}).get('floats',
                                                           [0, 0, 0]),
                         np.float32)
    plane_n = np.asarray(feats.get('plane/normal', {}).get('floats',
                                                           [0, 1, 0]),
                         np.float32)
    return image, p2, p3, vis, (plane_c, plane_n)


def main():
    parser = argparse.ArgumentParser(description='Objectron-protocol eval')
    parser.add_argument('--eval_data', type=str, required=True,
                        help='glob root with per-class TFRecord shards, e.g. '
                             '/data/records/{class}/*')
    parser.add_argument('--reg_config', type=str, default='')
    parser.add_argument('--det_checkpoint', type=str, default='')
    parser.add_argument('--reg_checkpoint', type=str, default='')
    parser.add_argument('--classes', type=str, nargs='+', default=['all'])
    parser.add_argument('--max_num', type=int, default=-1,
                        help='max examples per class')
    parser.add_argument('--report_dir', type=str, default='./eval_reports')
    parser.add_argument('--det_tresh', type=float, default=0.6)
    parser.add_argument('--vis_thresh', type=float, default=0.1)
    parser.add_argument('--batch', type=int, default=8,
                        help='frames per fused engine program (same-shape '
                             'shards run batched; mixed shapes fall back '
                             'to per-frame)')
    parser.add_argument('--refine_passes', type=int, default=0,
                        help='keypoint-refinement passes in the fused '
                             'engine (re-crop around predicted extent)')
    parser.add_argument('--refine_margin', type=float, default=10.0)
    parser.add_argument('--det_score_thr', type=float, default=0.02,
                        help='detector decode score floor (pre-NMS); must '
                             'be <= det_tresh to have predictions survive')
    parser.add_argument('--soft_nms', type=float, default=0.0,
                        help='gaussian soft-NMS sigma (0 = hard NMS); '
                             'occluded same-class objects survive with '
                             'decayed scores instead of being suppressed')
    parser.add_argument('--soft_nms_dup', type=float, default=0.75,
                        help='soft-NMS duplicate cutoff: overlaps above '
                             'this IoU are zeroed, not decayed (1.0 = '
                             'pure gaussian decay)')
    parser.add_argument('--max_detections', type=int, default=8)
    parser.add_argument('--box_vote', type=float, default=0.0,
                        help='box-voting IoU threshold: surviving boxes '
                             'become the score-weighted mean of pre-NMS '
                             'candidates above this overlap (0 = off)')
    parser.add_argument('--host_downscale', type=int, default=1,
                        help='host-side 1/d frame downscale before upload '
                             '(the link-bound serving mode); frames run '
                             'through the per-frame engine path, boxes are '
                             'rescaled to source pixels — this flag prices '
                             'the accuracy cost of the 21.8 fps '
                             'downscale-2 operating point')
    parser.add_argument('--tta_flip', action='store_true',
                        help='horizontal-flip test-time augmentation for '
                             'the regressor: crop + mirror in one doubled '
                             'batch, predictions averaged (net-new vs the '
                             'reference)')
    parser.add_argument('--int8', action='store_true',
                        help='serve both stages through the int8 PTQ path '
                             '(infer/quant.py), self-calibrated on the '
                             'first frame of each class shard; measured '
                             'cost: ~4 px box / 0.33 px keypoint drift, '
                             'protocol 2D error within 0.002 of bf16')
    parser.add_argument('--int8_calib', type=int, default=9,
                        help='number of calibration frames for --int8')
    parser.add_argument('--preset', type=str, default='',
                        choices=['', 'recall'],
                        help="'recall' applies the measured miss-recovery "
                             'operating point (BASELINE.md round-3 ladder: '
                             'det_tresh 0.01, det_score_thr 0.005, '
                             'soft_nms 0.5, soft_nms_dup 0.75, '
                             'refine_passes 1 — chain mean AP@IoU0.5 '
                             '0.655 -> 0.759) to every knob the caller '
                             'left at its default')
    parser.add_argument('--gt_boxes', action='store_true',
                        help='DIAGNOSTIC (not the vendor protocol): bypass '
                             'the detector and crop from GT-keypoint-extent '
                             '+10px boxes — the stage-2+protocol ceiling, '
                             'isolating detector-box damage per class')
    args = parser.parse_args()
    if args.preset == 'recall':
        # only fill knobs the caller left at parser defaults, so explicit
        # flags always win over the preset
        for knob, value in [('det_tresh', 0.01), ('det_score_thr', 0.005),
                            ('soft_nms', 0.5), ('soft_nms_dup', 0.75),
                            ('refine_passes', 1)]:
            if getattr(args, knob) == parser.get_default(knob):
                setattr(args, knob, value)

    from demo import build_engine   # same engine assembly as the demo CLI
    engine = build_engine(args.reg_config, args.det_checkpoint,
                          args.reg_checkpoint, det_conf=args.det_tresh,
                          refine_passes=args.refine_passes,
                          refine_margin_px=args.refine_margin,
                          score_thr=min(args.det_score_thr, args.det_tresh),
                          soft_nms_sigma=args.soft_nms,
                          soft_nms_dup_iou=args.soft_nms_dup,
                          max_detections=args.max_detections,
                          box_vote_iou=args.box_vote,
                          host_downscale=args.host_downscale,
                          tta_flip=args.tta_flip)
    gt_box_regressor = None
    if args.gt_boxes:
        assert not (args.int8 or args.tta_flip), \
            '--gt_boxes bypasses the fused engine (plain Regressor '\
            'wrapper) — --int8/--tta_flip would be silently ignored'
        from tpudet3d.infer.wrappers import Regressor
        gt_box_regressor = Regressor(engine.reg_model, engine.reg_vars,
                                     crop_size=engine.cfg.crop_size)

    classes = (OBJECTRON_CLASSES if args.classes == ['all'] else args.classes)

    if args.int8:
        from tpudet3d.infer.quant import calibrate_engine
        calib = []
        for category in classes:
            for shard in sorted(glob.glob(
                    osp.join(args.eval_data, category, '*')))[:1]:
                for payload in read_tfrecord(shard):
                    image, gt2d, _, _, _ = decode_example(payload)
                    if image is not None and len(gt2d):
                        calib.append(image)
                        break
                break
            if len(calib) >= args.int8_calib:
                break
        assert calib, '--int8: no calibration frames found in eval shards'
        det_scales, reg_scales = calibrate_engine(engine, calib)
        engine.cfg.det_int8_scales = det_scales
        engine.cfg.reg_int8_scales = reg_scales
        engine._build_pipelines()
        print(f'int8: calibrated {len(det_scales)}+{len(reg_scales)} convs '
              f'on {len(calib)} frames')
    mkdir_if_missing(args.report_dir)

    for category in classes:
        shards = sorted(glob.glob(osp.join(args.eval_data, category, '*')))
        if not shards:
            print(f'[{category}] no shards under {args.eval_data}, skipping')
            continue
        evaluator = ObjectronProtocolEvaluator()
        # The engine runs in server batches: the reference loops one IE
        # infer per image (objectron_eval.py:265-286) — here up to --batch
        # frames share one fused XLA program dispatch, which also amortizes
        # the host→device round-trip.  Decoding streams chunk by chunk so
        # memory stays O(batch), not O(shard).
        # infer_batch has no host-downscale path: when downscaling, every
        # chunk runs the per-frame engine (identical accuracy, slower)
        force_per_frame = int(engine.cfg.host_downscale) != 1

        def stream_examples():
            n = 0
            for shard in shards:
                for payload in read_tfrecord(shard):
                    if 0 <= args.max_num <= n:
                        return
                    image, gt2d, gt3d, vis, plane = decode_example(payload)
                    if image is None or len(gt2d) == 0:
                        continue
                    if not len(vis):
                        vis = np.ones(len(gt2d), np.float32)
                    n += 1
                    yield image, gt2d, gt3d, vis, plane

        def stream_chunks():
            chunk = []
            for ex in stream_examples():
                if chunk and ex[0].shape != chunk[0][0].shape:
                    yield chunk
                    chunk = []
                chunk.append(ex)
                if len(chunk) == args.batch:
                    yield chunk
                    chunk = []
            if chunk:
                yield chunk

        n_done = 0
        for chunk in stream_chunks():
            if gt_box_regressor is not None:
                results = []
                for image, gt2d, _, _, _ in chunk:
                    h, w = image.shape[:2]
                    dets = []
                    for g in gt2d:
                        ext = g * np.asarray([w, h], np.float32)
                        lo = np.clip(ext.min(0) - 10.0, 0, [w - 1, h - 1])
                        hi = np.clip(ext.max(0) + 10.0, 0, [w, h])
                        dets.append((lo[0], lo[1], hi[0], hi[1], 1.0, 0))
                    outs = gt_box_regressor.get_detections(image, dets)
                    results.append({
                        'boxes': np.asarray([d[:4] for d in dets],
                                            np.float32),
                        'kp': np.asarray([o[0] for o in outs], np.float32),
                    })
            elif len(chunk) > 1 and not force_per_frame:
                pad = chunk + chunk[-1:] * (args.batch - len(chunk))
                results = engine.infer_batch(
                    np.stack([e[0] for e in pad]))[:len(chunk)]
            else:   # lone frame (odd tail / shape change)
                results = [engine(e[0]) for e in chunk]
            for (image, gt2d, gt3d, vis, plane), result in zip(chunk,
                                                               results):
                h, w = image.shape[:2]
                pred2d = []
                for box, kp in zip(result['boxes'], result['kp']):
                    x0, y0, x1, y1 = box
                    abs_kp = kp * np.asarray([x1 - x0, y1 - y0]) + \
                        np.asarray([x0, y0])
                    pred2d.append(abs_kp / np.asarray([w, h], np.float32))
                if pred2d:
                    pred3d = np.asarray(lift_2d_batched(
                        np.asarray(pred2d, np.float32), portrait=True))
                else:
                    pred3d = np.zeros((0, 9, 3), np.float32)
                evaluator.evaluate_example(
                    [p for p in pred2d], [p for p in pred3d],
                    [g for g in gt2d], [g for g in gt3d], plane=plane,
                    visibilities=vis, vis_thresh=args.vis_thresh)
                n_done += 1
        evaluator.finalize()
        report_path = osp.join(args.report_dir, f'report_{category}.txt')
        with open(report_path, 'w') as f:
            evaluator.write_report(category, f)
        evaluator.write_report(category)
        print(f'[{category}] evaluated {n_done} examples → {report_path}')


if __name__ == '__main__':
    main()
