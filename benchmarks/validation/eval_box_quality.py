"""Per-class detector-box quality on the HELD-OUT protocol eval scenes.

Round-3 diagnostic: train-scene detector boxes are tight (mean IoU 0.896,
p50 side error 1.9 px — BASELINE.md), yet the deployed chain loses 0.15
mean AP vs the GT-box ceiling.  This runs the trained detector over the
exact scenes `write_eval_shards` feeds the protocol (same per-class
seeds, synthetic_scene.py:442-447) and reports per-class match rate +
box tightness, so the gap can be attributed per class (expected suspects
from the ceiling table: bike/chair/laptop).

Matched boxes only — false positives are not scored here (the protocol
runner's AP already prices them); misses show up as match-rate deficit.

Usage (TPU must be idle):
    python benchmarks/validation/eval_box_quality.py \
        [--det_checkpoint output/detector_scene/snap_39] [--per_class 16]
"""

import argparse
import os.path as osp
import sys
import tempfile

import numpy as np

_ROOT = osp.join(osp.dirname(osp.abspath(__file__)), '..', '..')
sys.path.insert(0, _ROOT)

from tpudet3d.core import OBJECTRON_CLASSES, enable_compile_cache

enable_compile_cache()


def box_stats(scene, boxes, valid):
    """(mean IoU, p50/p90 per-side |err| px, n_matched, n_objects)."""
    h, w = scene.frame_hw
    ious, errs = [], []
    n_obj = 0
    for i in range(len(scene)):
        s = scene.sample(i)
        kps_px = s['kps2d'] * np.asarray([w, h], np.float32)
        gt = np.concatenate([kps_px.min(axis=1), kps_px.max(axis=1)], axis=1)
        n = len(gt)
        n_obj += n
        for j in range(n):
            if not valid[i, j]:
                continue
            b, g = boxes[i, j], gt[j]
            ix0, iy0 = max(b[0], g[0]), max(b[1], g[1])
            ix1, iy1 = min(b[2], g[2]), min(b[3], g[3])
            inter = max(ix1 - ix0, 0) * max(iy1 - iy0, 0)
            a_b = (b[2] - b[0]) * (b[3] - b[1])
            a_g = (g[2] - g[0]) * (g[3] - g[1])
            ious.append(inter / max(a_b + a_g - inter, 1e-9))
            errs.extend(np.abs(b - g).tolist())
    ious, errs = np.asarray(ious), np.asarray(errs)
    n_matched = len(ious)
    if n_matched == 0:
        return 0.0, 0.0, 0.0, 0, n_obj
    return (float(ious.mean()), float(np.percentile(errs, 50)),
            float(np.percentile(errs, 90)), n_matched, n_obj)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--det_checkpoint', type=str,
                    default=osp.join(_ROOT, 'output', 'detector_scene',
                                     'snap_39'))
    ap.add_argument('--per_class', type=int, default=16)
    ap.add_argument('--score_thr', type=float, default=0.05)
    ap.add_argument('--box_vote', type=float, default=0.0,
                    help='box-voting IoU threshold in the decode (0 = off)')
    ap.add_argument('--seed', type=int, default=77,
                    help='base eval seed (write_eval_shards default in the '
                         'protocol runner)')
    args = ap.parse_args()

    from tpudet3d.data.synthetic_scene import SyntheticScene
    from tpudet3d.data.selflabel import generate_selflabel_boxes

    print(f'{"class":<12} {"match":>9} {"meanIoU":>8} {"p50err":>7} '
          f'{"p90err":>7}')
    tot_m = tot_o = 0
    iou_sum = 0.0
    with tempfile.TemporaryDirectory() as td:
        for ci, cls in enumerate(OBJECTRON_CLASSES):
            cls_id = OBJECTRON_CLASSES.index(cls)
            # mirror write_eval_shards' per-class scene construction
            scene = SyntheticScene(length=args.per_class,
                                   frame_hw=(480, 640),
                                   seed=args.seed + 131 * ci,
                                   classes=(cls_id,),
                                   min_objects=1, max_objects=3)
            out = osp.join(td, f'{cls}.npz')
            generate_selflabel_boxes(scene, args.det_checkpoint, out,
                                     score_thr=args.score_thr,
                                     box_vote_iou=args.box_vote)
            data = np.load(out)
            miou, p50, p90, nm, no = box_stats(scene, data['boxes'],
                                               data['valid'])
            print(f'{cls:<12} {nm:>4}/{no:<4} {miou:>8.3f} {p50:>7.1f} '
                  f'{p90:>7.1f}')
            tot_m += nm
            tot_o += no
            iou_sum += miou
    n = len(OBJECTRON_CLASSES)
    print(f'{"MEAN":<12} {tot_m:>4}/{tot_o:<4} {iou_sum / n:>8.3f}')


if __name__ == '__main__':
    main()
