"""Export the trained regressor as a deployment artifact.

CLI parity with the reference (scripts/export.py): picks the latest
snapshot from ``cfg.output_dir`` unless an explicit checkpoint is given,
builds the export-mode model and serializes it with preprocessing folded in
(StableHLO via jax.export instead of ONNX/OpenVINO IR — SURVEY.md §2.9).
"""

import argparse
import os.path as osp
import sys

sys.path.insert(0, osp.join(osp.dirname(__file__), '..'))

import jax

from tpudet3d.core import read_py_config

from tpudet3d.core import enable_compile_cache
enable_compile_cache()
from tpudet3d.infer import export_regressor
from tpudet3d.train.pipeline import setup_training
from tpudet3d.utils import latest_snapshot, resume_from


def main():
    parser = argparse.ArgumentParser(description='model export')
    parser.add_argument('--config', type=str, required=True)
    parser.add_argument('--model_export_path', type=str,
                        default='./converted_models')
    parser.add_argument('--snapshot', type=str, default='',
                        help='explicit checkpoint; default = newest snap in '
                             'cfg.output_dir')
    parser.add_argument('--img_size', type=int, nargs=2, default=None,
                        help='export input size; default 128x128 like the '
                             'reference (export.py:11)')
    parser.add_argument('--batch_size', type=int, default=1)
    args = parser.parse_args()

    cfg = read_py_config(args.config)
    pipe = setup_training(cfg, with_loaders=False)
    state = pipe.state
    snap = args.snapshot or latest_snapshot(cfg.output_dir)
    if snap:
        state, _ = resume_from(state, snap)
        print(f'loaded weights from {snap}')
    else:
        print('WARNING: no snapshot found, exporting random weights')
    img_size = tuple(args.img_size) if args.img_size else (128, 128)
    from tpudet3d.train.state import eval_params
    variables = {'params': jax.device_get(eval_params(state)),
                 'batch_stats': jax.device_get(state.batch_stats)}
    export_regressor(pipe.model, variables, args.model_export_path,
                     img_size=img_size, batch_size=args.batch_size)


if __name__ == '__main__':
    main()
