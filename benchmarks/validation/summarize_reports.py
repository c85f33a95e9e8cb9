"""Summarize Objectron-protocol report dirs into one comparison table.

Each report dir is the output of scripts/objectron_eval.py (one
report_<class>.txt per class, same format as the reference's
scripts/objectron_eval.py:177-237 report writer).  Prints per-class and
mean AP@IoU0.5 / AP@ADD0.1 / dedup-AP@IoU0.5 / mean 3D IoU rows for each
dir so deploy-knob ladders (det_tresh, soft-NMS, refinement, int8) can be
compared side by side; partial dirs (interrupted runs) summarize over the
classes present and say so.

Usage: python benchmarks/validation/summarize_reports.py output/protocol_reports_*
"""

import argparse
import glob
import os.path as osp
import re
import sys

sys.path.insert(0, osp.join(osp.dirname(osp.abspath(__file__)), '..', '..'))

from tpudet3d.core import OBJECTRON_CLASSES


def parse_report(path):
    with open(path) as f:
        text = f.read()

    def arr(label):
        line = next((l for l in text.splitlines() if l.startswith(label)),
                    None)
        if line is None:   # round-2 reports predate the dedup variant
            return [float('nan')] * 21
        return [float(v) for v in re.findall(r'-?\d+\.\d+', line)]

    return {
        'ap_iou05': arr('AP @3D IoU')[10],
        'ap_add01': arr('AP @ADD')[2],
        'ap_iou05_dedup': arr('AP Dedup @3D IoU')[10],
        'mean_iou': float(re.search(r'Mean 3D IoU: ([-\d.e]+)',
                                    text).group(1)),
        'mean_2d': float(re.search(r'Mean Error 2D: ([-\d.e]+)',
                                   text).group(1)),
        'matched': re.search(r'matched (\d+/\d+)', text).group(1),
    }


def summarize(report_dir, per_class=False):
    rows = {}
    for cls in OBJECTRON_CLASSES:
        path = osp.join(report_dir, f'report_{cls}.txt')
        if osp.exists(path):
            rows[cls] = parse_report(path)
    if not rows:
        return None
    if per_class:
        for cls, r in rows.items():
            print(f'  {cls:<12} {r["ap_iou05"]:>10.3f} {r["ap_add01"]:>10.3f}'
                  f' {r["ap_iou05_dedup"]:>11.3f} {r["mean_iou"]:>10.3f}'
                  f' {r["mean_2d"]:>10.4f} {r["matched"]:>9}')
    n = len(rows)
    mean = {k: sum(r[k] for r in rows.values()) / n
            for k in ('ap_iou05', 'ap_add01', 'ap_iou05_dedup', 'mean_iou')}
    partial = '' if n == len(OBJECTRON_CLASSES) else \
        f'  [PARTIAL {n}/{len(OBJECTRON_CLASSES)} classes]'
    return mean, partial


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('report_dirs', nargs='+')
    ap.add_argument('--per_class', action='store_true')
    args = ap.parse_args()

    dirs = []
    for pat in args.report_dirs:
        dirs.extend(sorted(glob.glob(pat)) or [pat])

    print(f'{"report dir":<40} {"AP@IoU0.5":>10} {"AP@ADD0.1":>10} '
          f'{"dedupIoU0.5":>11} {"mean3DIoU":>10}')
    for d in dirs:
        out = summarize(d, per_class=args.per_class)
        if out is None:
            print(f'{osp.basename(d):<40} (no reports)')
            continue
        mean, partial = out
        print(f'{osp.basename(d):<40} {mean["ap_iou05"]:>10.3f} '
              f'{mean["ap_add01"]:>10.3f} {mean["ap_iou05_dedup"]:>11.3f} '
              f'{mean["mean_iou"]:>10.3f}{partial}')


if __name__ == '__main__':
    main()
