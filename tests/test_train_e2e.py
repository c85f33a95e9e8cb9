"""End-to-end training slice on synthetic data over the 8-device CPU mesh.

Covers SURVEY.md §7 step 2: dataset → augment (device) → multi-head model →
LossManager → jitted sharded train step → Evaluator.val → checkpoint/resume.
"""

import os
import tempfile

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tpudet3d.core import AttrDict
from tpudet3d.eval.evaluator import Evaluator
from tpudet3d.train import Trainer
from tpudet3d.train.pipeline import setup_training
from tpudet3d.utils import save_snap, resume_from, latest_snapshot


def tiny_cfg(tmpdir, batch=16, epochs=2):
    size = (64, 64)
    return AttrDict(
        data=dict(root='', resize=size, train_batch_size=batch,
                  val_batch_size=batch, max_epochs=epochs, num_workers=2,
                  category_list='all', synthetic=True, synthetic_length=64,
                  normalization=dict(mean=[0.5931, 0.4690, 0.4229],
                                     std=[0.2471, 0.2214, 0.2157])),
        model=dict(name='mobilenetv3_small', pretrained=False, num_classes=9,
                   bf16=False),
        data_parallel=dict(use_parallel=True, num_devices=None),
        optim=dict(name='adam', lr=1e-3, momentum=0.9, wd=1e-4,
                   betas=(0.9, 0.999), rho=0.9, alpha=0.99, nesterov=True),
        scheduler=dict(name='multistepLR', gamma=0.6, exp_gamma=0.975,
                       steps=[1]),
        loss=dict(names=['l1', 'add_loss', 'cross_entropy'],
                  coeffs=([1., .1], [.2]), smoothl1_beta=0.2,
                  alwa=dict(use=False, lam_cls=1., lam_reg=1., C=100,
                            compute_std=True),
                  w=5.18, eps=1.),
        output_dir=str(tmpdir),
        utils=dict(debug_mode=False, random_seeds=5, save_freq=1,
                   print_freq=100, debug_steps=100, eval_freq=1),
        regime=dict(type='training', vis_only=False),
        train_data_pipeline=[('convert_color', dict()),
                             ('horizontal_flip', dict(p=0.4)),
                             ('random_brightness_contrast', dict(p=0.3)),
                             ('random_rotate', dict(angle_limit=10., p=0.4)),
                             ('normalize', dict(mean=[0.5931, 0.4690, 0.4229],
                                                std=[0.2471, 0.2214, 0.2157])),
                             ('to_tensor', dict(img_shape=size))],
        test_data_pipeline=[('convert_color', dict()),
                            ('normalize', dict(mean=[0.5931, 0.4690, 0.4229],
                                               std=[0.2471, 0.2214, 0.2157])),
                            ('to_tensor', dict(img_shape=size))])


class TestTrainE2E:

    def test_train_two_epochs_sharded(self, devices, tmp_path):
        cfg = tiny_cfg(tmp_path)
        pipe = setup_training(cfg)
        assert pipe.mesh.devices.size == 8

        trainer = Trainer(train_step=pipe.train_step, state=pipe.state,
                          train_loader=pipe.train_loader,
                          lr_schedule=pipe.lr_schedule, writer=None,
                          max_epoch=2, log_path=str(tmp_path),
                          augment_fn=None, put_fn=pipe.put_fn,
                          save_chkpt=True, print_freq=100, save_freq=1)
        losses = []
        for epoch in range(2):
            state = trainer.train(epoch, epoch == 1)
        assert int(np.asarray(state.step)) == 2 * len(pipe.train_loader)

        evaluator = Evaluator(eval_step=pipe.eval_step,
                              state_fn=lambda: trainer.state,
                              val_loader=pipe.val_loader,
                              test_loader=pipe.test_loader,
                              test_transform=pipe.test_aug,
                              put_fn=pipe.put_fn)
        add, sadd, acc, iou = evaluator.val(epoch=1, compute_iou=True)
        assert 0 <= add <= 1 and 0 <= sadd <= 1
        assert 0 <= acc <= 1 and 0 <= iou <= 1

        # checkpoint was written and resumes
        snap = latest_snapshot(str(tmp_path))
        assert snap is not None and snap.endswith('snap_1')
        fresh = setup_training(cfg)
        restored, start_epoch = resume_from(fresh.state, snap)
        assert start_epoch == 2
        old = jax.device_get(trainer.state.params)
        new = jax.device_get(restored.params)
        leaf_old = jax.tree_util.tree_leaves(old)[0]
        leaf_new = jax.tree_util.tree_leaves(new)[0]
        assert np.allclose(leaf_old, leaf_new)

    def test_loss_decreases_on_overfit(self, tmp_path):
        """Sanity: 30 steps on one batch reduce the loss."""
        cfg = tiny_cfg(tmp_path, batch=8)
        cfg.data.synthetic_length = 8
        pipe = setup_training(cfg)
        imgs, kps, cats, _ = next(iter(pipe.train_loader))
        imgs_d, kps_d, cats_d = map(pipe.put_fn, (imgs, kps, cats))
        state = pipe.state
        first = last = None
        for i in range(30):
            state, metrics = pipe.train_step(state, imgs_d, kps_d, cats_d,
                                             jax.random.PRNGKey(i))
            val = float(np.asarray(metrics)[0])
            first = val if first is None else first
            last = val
        assert last < first, (first, last)
