"""Generate self-labeled detector boxes for regressor training.

Runs the trained detector over the TRAINING scene stream of a regressor
config (the same scenes `scripts/main.py` will train on) and writes the
matched per-object predicted boxes (frame pixels) to an npz consumed by
``SceneCrops(det_boxes=...)`` — see tpudet3d/data/selflabel.py for why.

Usage:
    python scripts/selflabel_boxes.py \
        --config configs/scene_regressor_selflabel.py \
        --det_checkpoint output/detector_scene/snap_39 \
        --out output/selflabel_boxes.npz
"""

import argparse
import os.path as osp
import sys

sys.path.insert(0, osp.join(osp.dirname(__file__), '..'))

from tpudet3d.core import read_py_config, enable_compile_cache
enable_compile_cache()


def main():
    parser = argparse.ArgumentParser(description='self-label detector boxes')
    parser.add_argument('--config', type=str, required=True,
                        help='regressor config (scene_* family)')
    parser.add_argument('--det_checkpoint', type=str, required=True)
    parser.add_argument('--out', type=str, required=True)
    parser.add_argument('--score_thr', type=float, default=0.05,
                        help='detector confidence floor (the protocol '
                             'runner deploys at det_tresh 0.05)')
    parser.add_argument('--iou_match', type=float, default=0.25)
    parser.add_argument('--batch', type=int, default=32)
    args = parser.parse_args()

    cfg = read_py_config(args.config)
    assert cfg.data.get('synthetic') == 'scene', \
        'self-labeling targets the scene datasets'

    from tpudet3d.data.synthetic_scene import SyntheticScene
    from tpudet3d.data.selflabel import generate_selflabel_boxes
    # mirror data/loader.py _make_dataset: train split uses the raw seed
    scene = SyntheticScene(
        length=int(cfg.data.get('synthetic_length', 1024)),
        seed=int(cfg.data.get('scene_seed', 23)),
        cache_dir=cfg.data.get('scene_cache', ''))
    matched, total = generate_selflabel_boxes(
        scene, args.det_checkpoint, args.out, score_thr=args.score_thr,
        iou_match=args.iou_match, batch=args.batch)
    print(f'matched {matched}/{total} objects '
          f'({100.0 * matched / max(total, 1):.1f}%) -> {args.out}')


if __name__ == '__main__':
    main()
