"""Train the MNv2-SSD-300 2D detector.

The reference delegates this step to an external mmdetection fork
(README.md:51-57); here it is first-party: jitted SSD train step over the
data-parallel mesh, mmdet-style warmup+step LR, Orbax checkpoints.
"""

import argparse
import os.path as osp
import sys
import time

sys.path.insert(0, osp.join(osp.dirname(__file__), '..'))

import jax
import jax.numpy as jnp
import numpy as np
import optax

from tpudet3d.core import (read_py_config, Logger, set_random_seed,
                           mkdir_if_missing)

from tpudet3d.core import enable_compile_cache
enable_compile_cache()
from tpudet3d.data.detection_dataset import DetectionDataset, SyntheticDetection
from tpudet3d.data.det_transforms import build_detector_augmentations
from tpudet3d.data.loader import BatchLoader
from tpudet3d.detect import SSDDetector
from tpudet3d.detect.train import (create_detector_state,
                                   make_detector_train_step, warmup_step_lr,
                                   DetectorTrainer)
from tpudet3d.parallel import make_mesh, shard_batch, replicate
from functools import partial


class _DetBatchLoader(BatchLoader):
    """BatchLoader over (img, boxes, labels, valid) detection items.
    host_transform here is fn(epoch, idx, img, boxes, labels, valid)."""

    def _assemble(self, indices, epoch):
        items = [self.dataset[int(i)] for i in indices]
        if self.host_transform is not None:
            items = [self.host_transform(epoch, int(i), *it)
                     for i, it in zip(indices, items)]
        return tuple(np.stack([it[k] for it in items]) for k in range(4))


def main():
    parser = argparse.ArgumentParser(description='SSD detector training')
    parser.add_argument('--config', type=str,
                        default='./configs/detection/mnv2_ssd_300.py')
    parser.add_argument('--root', type=str, default='')
    parser.add_argument('--output_dir', type=str, default='')
    parser.add_argument('--loss_balancing', choices=['on', 'off'], default='',
                        help='override cfg.train_cfg.loss_balancing')
    parser.add_argument('--max_epochs', type=int, default=0)
    parser.add_argument('--resume', type=str, default='',
                        help="snapshot path, or 'auto' to resume from the "
                             'newest snap_* in the output dir')
    args = parser.parse_args()
    cfg = read_py_config(args.config)
    if args.root:
        cfg.data.root = args.root
    if args.output_dir:
        cfg.output_dir = args.output_dir
    if args.loss_balancing:
        cfg.train_cfg.loss_balancing = args.loss_balancing == 'on'
    if args.max_epochs:
        cfg.data.max_epochs = args.max_epochs
    mkdir_if_missing(cfg.output_dir)
    sys.stdout = Logger(osp.join(cfg.output_dir,
                                 'det_train.log' + time.strftime('-%Y-%m-%d-%H-%M-%S')))
    root_key = set_random_seed(int(cfg.utils.random_seeds))

    mesh = make_mesh(jax.devices()[:int(cfg.data_parallel.num_devices)]
                     if cfg.data_parallel.num_devices else None)

    dtype = jnp.bfloat16 if cfg.model.get('bf16', False) else jnp.float32
    model = SSDDetector(num_classes=int(cfg.model.num_classes),
                        width_mult=float(cfg.model.width_mult), dtype=dtype,
                        cascade=bool(cfg.model.get('cascade', False)))

    base_lr = float(cfg.optim.lr)
    opt = optax.inject_hyperparams(
        lambda learning_rate: optax.chain(
            optax.add_decayed_weights(float(cfg.optim.wd)),
            optax.sgd(learning_rate, momentum=float(cfg.optim.momentum))))(
        learning_rate=base_lr)

    ema_decay = float(cfg.optim.get('ema_decay', 0.0) or 0.0)
    state = create_detector_state(model, opt, root_key,
                                  input_size=int(cfg.input_size),
                                  ema_decay=ema_decay)
    start_epoch = 0
    resume_path = args.resume
    if resume_path == 'auto':
        from tpudet3d.utils.checkpoint import latest_snapshot
        resume_path = latest_snapshot(cfg.output_dir) or ''
        if not resume_path:
            print('==> --resume auto: no snapshot found, training from scratch')
    if resume_path:
        from tpudet3d.utils.checkpoint import resume_from
        state, start_epoch = resume_from(state, resume_path)
        print(f'==> resuming detector training at epoch {start_epoch}')
    state = replicate(state, mesh)

    if cfg.data.synthetic == 'scene':
        from tpudet3d.data.synthetic_scene import (SyntheticScene,
                                                   SceneDetection)
        ds = SceneDetection(
            SyntheticScene(length=int(cfg.data.synthetic_length),
                           seed=int(cfg.data.get('scene_seed', 23)),
                           cache_dir=cfg.data.get('scene_cache', '')),
            input_size=int(cfg.input_size),
            max_boxes=int(cfg.data.max_boxes))
    elif cfg.data.synthetic:
        ds = SyntheticDetection(length=int(cfg.data.synthetic_length),
                                input_size=int(cfg.input_size),
                                max_boxes=int(cfg.data.max_boxes),
                                hard=bool(cfg.data.get('synthetic_hard')))
    else:
        ds = DetectionDataset(cfg.data.root, 'train',
                              input_size=int(cfg.input_size),
                              min_size=int(cfg.data.min_size),
                              max_boxes=int(cfg.data.max_boxes))
    from tpudet3d.data.det_host_transforms import build_detection_host_pipeline
    host_aug = build_detection_host_pipeline(
        input_size=int(cfg.input_size),
        enable=bool(cfg.augment.get('expand_crop', True)),
        seed=int(cfg.utils.random_seeds))
    loader = _DetBatchLoader(ds, int(cfg.data.train_batch_size), shuffle=True,
                             drop_last=True,
                             num_threads=int(cfg.data.num_workers),
                             host_transform=host_aug)

    lr_fn = warmup_step_lr(base_lr=base_lr,
                           warmup_iters=int(cfg.scheduler.warmup_iters),
                           warmup_ratio=float(cfg.scheduler.warmup_ratio),
                           milestones=tuple(cfg.scheduler.steps),
                           gamma=float(cfg.scheduler.gamma),
                           steps_per_epoch=max(len(loader), 1))

    def set_lr(opt_state, lr):
        opt_state.hyperparams['learning_rate'] = jnp.asarray(lr, jnp.float32)

    trainer = DetectorTrainer(
        train_step=make_detector_train_step(
            model, opt, use_balance=bool(cfg.train_cfg.loss_balancing),
            ema_decay=ema_decay,
            giou_weight=float(cfg.train_cfg.get('giou_weight', 0.0) or 0.0),
            cascade_pos_thr=float(cfg.train_cfg.get('cascade_pos_thr', 0.5))),
        state=state, train_loader=loader, lr_fn=lr_fn, opt_set_lr=set_lr,
        max_epoch=int(cfg.data.max_epochs), log_path=cfg.output_dir,
        print_freq=int(cfg.utils.print_freq),
        save_freq=int(cfg.utils.save_freq),
        augment_fn=jax.jit(build_detector_augmentations(
            flip_p=float(cfg.augment.flip_p), rot_p=float(cfg.augment.rot_p))),
        put_fn=partial(shard_batch, mesh=mesh),
        rng=jax.random.PRNGKey(int(cfg.utils.random_seeds) + 1))

    # validation set (synthetic twin or the converted test split)
    if cfg.data.synthetic == 'scene':
        from tpudet3d.data.synthetic_scene import (SyntheticScene,
                                                   SceneDetection)
        val_ds = SceneDetection(
            SyntheticScene(length=max(int(cfg.data.synthetic_length) // 4, 8),
                           seed=int(cfg.data.get('scene_seed', 23)) + 917 * 2,
                           cache_dir=cfg.data.get('scene_cache', '')),
            input_size=int(cfg.input_size),
            max_boxes=int(cfg.data.max_boxes))
    elif cfg.data.synthetic:
        val_ds = SyntheticDetection(length=max(int(cfg.data.synthetic_length) // 4, 8),
                                    input_size=int(cfg.input_size),
                                    max_boxes=int(cfg.data.max_boxes), seed=99,
                                    hard=bool(cfg.data.get('synthetic_hard')))
    else:
        try:
            val_ds = DetectionDataset(cfg.data.root, 'test',
                                      input_size=int(cfg.input_size),
                                      min_size=int(cfg.data.min_size),
                                      max_boxes=int(cfg.data.max_boxes))
        except FileNotFoundError:
            val_ds = None
    val_loader = (_DetBatchLoader(val_ds, int(cfg.data.val_batch_size),
                                  shuffle=False,
                                  num_threads=int(cfg.data.num_workers))
                  if val_ds is not None else None)
    test_aug = jax.jit(build_detector_augmentations(train=False))

    def validate(state, epoch):
        from tpudet3d.detect import DetectorEvaluator
        from tpudet3d.core import DETECTOR_CLASSES
        val_params = (state.ema_params if state.ema_params is not None
                      else state.params)
        evaluator = DetectorEvaluator(
            model, {'params': val_params, 'batch_stats': state.batch_stats})
        for imgs, boxes, labels, valid, _n in val_loader:
            imgs_d, _ = test_aug(jnp.asarray(imgs), jnp.asarray(boxes),
                                 jax.random.PRNGKey(0))
            evaluator.add_batch(imgs_d, boxes, labels, valid)
        res = evaluator.results()
        per_cls = ' '.join(f'{DETECTOR_CLASSES[c]}:{res[c]:.3f}'
                           for c in range(9))
        print(f'val epoch {epoch}: mAP@0.5 {res["mAP"]:.4f} ({per_cls})',
              flush=True)

    for epoch in range(start_epoch, int(cfg.data.max_epochs)):
        trainer.train(epoch, epoch == int(cfg.data.max_epochs) - 1)
        if val_loader is not None and \
                (epoch % int(cfg.utils.save_freq) == 0 or
                 epoch == int(cfg.data.max_epochs) - 1):
            validate(trainer.state, epoch)


if __name__ == '__main__':
    main()
