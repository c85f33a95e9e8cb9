"""End-to-end protocol validation with a TRAINED two-stage system.

Chains the four public CLI surfaces on coherent synthetic scenes whose 3D
geometry is exact (tpudet3d/data/synthetic_scene.py):

  1. scripts/train_detector.py  — MNv2-SSD-300 on full scene frames
  2. scripts/main.py            — MNv3 multi-head regressor on GT-box crops
  3. write_eval_shards          — per-class TFRecord eval shards
  4. scripts/objectron_eval.py  — fused engine → EPnP lift → plane scale →
                                  vendor AP report per class

Because GT 2D keypoints lift to the exact 3D boxes on these scenes (see
tests/test_synthetic_scene.py), the resulting AP@3D-IoU / AP@ADD numbers
measure the MODEL chain, not the harness — the reference can only produce
these on real Objectron data (scripts/objectron_eval.py), which is not
available in this environment.

Usage: python benchmarks/validation/protocol_end_to_end.py
       [--skip_train] [--per_class 16] [--classes cup chair]
"""

import argparse
import os.path as osp
import re
import subprocess
import sys

_ROOT = osp.join(osp.dirname(osp.abspath(__file__)), '..', '..')
sys.path.insert(0, _ROOT)

from tpudet3d.core import OBJECTRON_CLASSES


def run(cmd):
    print('>>', ' '.join(cmd), flush=True)
    proc = subprocess.run(cmd, cwd=_ROOT)
    if proc.returncode != 0:
        raise SystemExit(f'step failed rc={proc.returncode}: {cmd}')


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--skip_train', action='store_true',
                    help='reuse existing snapshots')
    ap.add_argument('--per_class', type=int, default=16)
    ap.add_argument('--classes', type=str, nargs='+', default=['all'])
    ap.add_argument('--det_tresh', type=float, default=0.05)
    ap.add_argument('--reg_config', type=str,
                    default=osp.join(_ROOT, 'configs', 'scene_regressor.py'),
                    help='regressor config (snapshot resolved from its '
                         'output_dir), e.g. configs/scene_regressor_selflabel.py')
    ap.add_argument('--report_dir', type=str,
                    default=osp.join(_ROOT, 'output', 'protocol_reports'))
    ap.add_argument('--refine_passes', type=int, default=0)
    ap.add_argument('--refine_margin', type=float, default=10.0)
    ap.add_argument('--soft_nms', type=float, default=0.0,
                    help='gaussian soft-NMS sigma for the detector decode')
    ap.add_argument('--soft_nms_dup', type=float, default=0.75,
                    help='soft-NMS duplicate cutoff IoU (1.0 = pure decay)')
    ap.add_argument('--det_score_thr', type=float, default=0.02,
                    help='detector decode score floor (pre-NMS)')
    ap.add_argument('--max_detections', type=int, default=8)
    ap.add_argument('--int8', action='store_true',
                    help='serve both stages through the int8 PTQ path')
    ap.add_argument('--tta_flip', action='store_true',
                    help='horizontal-flip TTA for the regressor')
    ap.add_argument('--gt_boxes', action='store_true',
                    help='stage-2 ceiling diagnostic: regressor on IDEAL '
                         'GT-extent+10 boxes (forwarded to objectron_eval)')
    ap.add_argument('--det_dir', type=str, default='',
                    help='stage-1 snapshot dir (default: '
                         'output/detector_scene; e.g. output/detector_cascade '
                         'for the cascade box-quality arm)')
    ap.add_argument('--box_vote', type=float, default=0.0,
                    help='box-voting IoU threshold for the detector decode '
                         '(0 = off; forwarded to objectron_eval)')
    ap.add_argument('--host_downscale', type=int, default=1,
                    help='host 1/d downscale before upload (forwarded; '
                         'prices the link-bound serving mode accuracy)')
    args = ap.parse_args()
    classes = (list(OBJECTRON_CLASSES) if args.classes == ['all']
               else args.classes)

    det_dir = args.det_dir or osp.join(_ROOT, 'output', 'detector_scene')
    reg_cfg = args.reg_config
    if not args.skip_train:
        run([sys.executable, 'scripts/train_detector.py',
             '--config', 'configs/detection/mnv2_ssd_300_scene.py'])
        run([sys.executable, 'scripts/main.py',
             '--config', 'configs/scene_regressor.py',
             '--output_dir', osp.join(_ROOT, 'output', 'scene_regressor')])

    shard_dir = osp.join(_ROOT, 'output', 'scene_eval_shards')
    from tpudet3d.data.synthetic_scene import write_eval_shards
    write_eval_shards(shard_dir, classes, per_class=args.per_class,
                      frame_hw=(480, 640), seed=77)   # held-out seed
    print(f'wrote {args.per_class} examples/class under {shard_dir}',
          flush=True)

    from tpudet3d.utils.checkpoint import latest_snapshot
    det_snap = latest_snapshot(det_dir)
    assert det_snap, f'no detector snapshot under {det_dir}'
    report_dir = args.report_dir
    run([sys.executable, 'scripts/objectron_eval.py',
         '--eval_data', shard_dir,
         '--reg_config', reg_cfg,
         '--det_checkpoint', det_snap,
         '--classes', *classes,
         '--report_dir', report_dir,
         '--det_tresh', str(args.det_tresh),
         '--refine_passes', str(args.refine_passes),
         '--refine_margin', str(args.refine_margin),
         '--soft_nms', str(args.soft_nms),
         '--soft_nms_dup', str(args.soft_nms_dup),
         '--det_score_thr', str(args.det_score_thr),
         '--box_vote', str(args.box_vote),
         '--host_downscale', str(args.host_downscale),
         '--max_detections', str(args.max_detections)]
        + (['--int8'] if args.int8 else [])
        + (['--tta_flip'] if args.tta_flip else [])
        + (['--gt_boxes'] if args.gt_boxes else []))

    # summary: AP@3D-IoU>=0.5 bin (bin 10 of 21), AP@ADD<=0.1m (bin 2),
    # mean 3D IoU / mean 2D error per class
    print('\n=== protocol summary (trained two-stage, synthetic scenes) ===')
    header = f'{"class":<12} {"AP@IoU0.5":>10} {"AP@ADD0.1":>10} ' \
             f'{"dedupIoU0.5":>11} {"mean3DIoU":>10} {"mean2Derr":>10} ' \
             f'{"matched":>9}'
    print(header)
    sums = [0.0, 0.0, 0.0, 0.0]
    for cls in classes:
        path = osp.join(report_dir, f'report_{cls}.txt')
        with open(path) as f:
            text = f.read()
        def arr(label, txt=text):
            line = next(l for l in txt.splitlines() if l.startswith(label))
            return [float(v) for v in re.findall(r'-?\d+\.\d+', line)]
        ap_iou = arr('AP @3D IoU')[10]
        ap_add = arr('AP @ADD')[2]
        # dedup variant (best prediction per GT): bounded to [0,1], so the
        # vendor artifact of duplicate detections can't inflate the mean
        ap_iou_dd = arr('AP Dedup @3D IoU')[10]
        mean_iou = float(re.search(r'Mean 3D IoU: ([-\d.e]+)', text).group(1))
        mean_2d = float(re.search(r'Mean Error 2D: ([-\d.e]+)', text).group(1))
        matched = re.search(r'matched (\d+/\d+)', text).group(1)
        print(f'{cls:<12} {ap_iou:>10.3f} {ap_add:>10.3f} '
              f'{ap_iou_dd:>11.3f} {mean_iou:>10.3f} {mean_2d:>10.4f} '
              f'{matched:>9}')
        for i, v in enumerate((ap_iou, ap_add, ap_iou_dd, mean_iou)):
            sums[i] += v
    n = max(len(classes), 1)
    print(f'{"MEAN":<12} {sums[0] / n:>10.3f} {sums[1] / n:>10.3f} '
          f'{sums[2] / n:>11.3f} {sums[3] / n:>10.3f}')


if __name__ == '__main__':
    main()
