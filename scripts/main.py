"""Training / evaluation entry point.

CLI + regime parity with the reference (scripts/main.py): config file,
--root/--output_dir overrides, stdout tee to a timestamped log, config
snapshot archive, resume, eval_freq-gated validation, final visual test —
with the TPU-native internals: one jitted train step over a data-parallel
device mesh, device-side augmentation, Orbax checkpoints.
"""

import argparse
import os.path as osp
import sys
import time
from shutil import copyfile

sys.path.insert(0, osp.join(osp.dirname(__file__), '..'))

import jax

from tpudet3d.core import (read_py_config, merge_cli_overrides, Logger,
                           set_random_seed, check_isfile, mkdir_if_missing)

from tpudet3d.core import enable_compile_cache
enable_compile_cache()
from tpudet3d.eval.evaluator import Evaluator
from tpudet3d.parallel import replicate
from tpudet3d.train import Trainer, param_count
from tpudet3d.train.pipeline import setup_training
from tpudet3d.utils import resume_from, load_pretrained_weights
from tpudet3d.data.loader import _make_dataset


def make_writer(output_dir):
    try:
        from torch.utils.tensorboard import SummaryWriter
        return SummaryWriter(output_dir)
    except ImportError:
        print('tensorboard not available; scalar logging disabled')
        return None


def main():
    parser = argparse.ArgumentParser(description='3D-object-detection training')
    parser.add_argument('--root', type=str, default='', help='path to root folder')
    parser.add_argument('--output_dir', type=str, default='',
                        help='directory to store training artifacts')
    parser.add_argument('--config', type=str, default='./configs/default_config.py',
                        help='path to config')
    parser.add_argument('--device', type=str, default='auto',
                        choices=['auto', 'tpu', 'cpu'],
                        help='device platform to train on')
    # parity quirk kept from the reference: passing the flag DISABLES saving
    parser.add_argument('--wo_saving_checkpoint', action='store_false',
                        help='if switched on -- the chkpt will not be saved')
    args = parser.parse_args()

    if args.device == 'cpu':
        jax.config.update('jax_platforms', 'cpu')

    cfg = read_py_config(args.config)
    merge_cli_overrides(cfg, args)

    log_name = 'train.log' if cfg.regime.type == 'training' else 'test.log'
    log_name += time.strftime('-%Y-%m-%d-%H-%M-%S')
    mkdir_if_missing(cfg.output_dir)
    sys.stdout = Logger(osp.join(cfg.output_dir, log_name))
    copyfile(args.config, osp.join(cfg.output_dir, 'dumped_config.py'))

    root_key = set_random_seed(int(cfg.utils.random_seeds))
    _, train_key = jax.random.split(root_key)

    pipe = setup_training(cfg, seed=int(cfg.utils.random_seeds))
    print(f'devices: {pipe.mesh.devices.tolist()}; mesh axes: {pipe.mesh.shape}')
    print(f'model: {cfg.model.name}; params: {param_count(pipe.state.params):,}')

    state = pipe.state
    if cfg.model.resume:
        state, start_epoch = resume_from(state, cfg.model.resume)
    else:
        start_epoch = 0
        if cfg.model.load_weights:
            if not check_isfile(cfg.model.load_weights) and \
                    not osp.isdir(cfg.model.load_weights):
                raise RuntimeError("the checkpoint isn't found or can't be loaded!")
            if not cfg.model.load_weights.endswith(('.pth', '.pt')):
                # .pth torch checkpoints were already imported inside
                # setup_training (see train/pipeline.py)
                state = load_pretrained_weights(state, cfg.model.load_weights)
    state = replicate(state, pipe.mesh)

    writer = make_writer(cfg.output_dir)
    train_step_counter = ((start_epoch - 1) * len(pipe.train_loader)
                          if start_epoch > 1 else 0)

    trainer = Trainer(train_step=pipe.train_step,
                      state=state,
                      train_loader=pipe.train_loader,
                      lr_schedule=pipe.lr_schedule,
                      writer=writer,
                      max_epoch=int(cfg.data.max_epochs),
                      log_path=cfg.output_dir,
                      augment_fn=None,   # augs are fused into train_step
                      put_fn=pipe.put_fn,
                      save_chkpt=args.wo_saving_checkpoint,
                      debug=bool(cfg.utils.debug_mode),
                      debug_steps=int(cfg.utils.debug_steps),
                      save_freq=int(cfg.utils.save_freq),
                      print_freq=int(cfg.utils.print_freq),
                      train_step_counter=train_step_counter,
                      rng=train_key)

    evaluator = Evaluator(eval_step=pipe.eval_step,
                          state_fn=lambda: trainer.state,
                          val_loader=pipe.val_loader,
                          test_loader=pipe.test_loader,
                          test_transform=pipe.test_aug,
                          writer=writer,
                          max_epoch=int(cfg.data.max_epochs),
                          path_to_save_imgs=cfg.output_dir,
                          debug=bool(cfg.utils.debug_mode),
                          debug_steps=int(cfg.utils.debug_steps),
                          test_dataset=_make_dataset(cfg, 'test'),
                          put_fn=pipe.put_fn)

    if cfg.regime.type == 'evaluation':
        evaluator.run_eval_pipe(cfg.regime.vis_only)
    else:
        assert cfg.regime.type == 'training'
        if cfg.model.resume:
            evaluator.val()
        for epoch in range(start_epoch, int(cfg.data.max_epochs)):
            is_last_epoch = epoch == int(cfg.data.max_epochs) - 1
            trainer.train(epoch, is_last_epoch)
            if epoch % int(cfg.utils.eval_freq) == 0 or is_last_epoch:
                # parity quirk kept: full 3D-IoU only on the last epoch
                # (reference scripts/main.py:105, SURVEY.md §8.16)
                evaluator.val(epoch, is_last_epoch)
        evaluator.visual_test()


if __name__ == '__main__':
    main()
