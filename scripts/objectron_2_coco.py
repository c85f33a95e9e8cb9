"""CLI for the Objectron → COCO conversion (reference:
annotation_converters/objectron_2_coco.py main)."""

import argparse
import os.path as osp
import sys

sys.path.insert(0, osp.join(osp.dirname(__file__), '..'))

from tpudet3d.core import OBJECTRON_CLASSES
from tpudet3d.data.converter import convert


def main():
    parser = argparse.ArgumentParser(description='Objectron → COCO converter')
    parser.add_argument('--data_root', type=str, required=True,
                        help='raw Objectron root (annotation/, videos/, index/)')
    parser.add_argument('--output_folder', type=str, required=True)
    parser.add_argument('--fps_divisor', type=int, default=1)
    parser.add_argument('--res_divisor', type=int, default=1)
    parser.add_argument('--obj_classes', type=str, nargs='+', default=['all'])
    parser.add_argument('--subsets', type=str, nargs='+',
                        default=['train', 'test'])
    parser.add_argument('--limit_videos', type=int, default=0)
    args = parser.parse_args()

    classes = (OBJECTRON_CLASSES if args.obj_classes == ['all']
               else args.obj_classes)
    for subset in args.subsets:
        convert(args.data_root, args.output_folder, subset,
                obj_classes=classes, fps_divisor=args.fps_divisor,
                res_divisor=args.res_divisor, limit_videos=args.limit_videos)


if __name__ == '__main__':
    main()
