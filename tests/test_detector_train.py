"""Detector train-step smoke test on the CPU mesh (tiny input size)."""

import numpy as np
import jax
import jax.numpy as jnp
import optax

from tpudet3d.detect import SSDDetector, generate_anchors, ssd_loss
from tpudet3d.detect.train import (create_detector_state,
                                   make_detector_train_step, warmup_step_lr)
from tpudet3d.data.detection_dataset import SyntheticDetection
from tpudet3d.data.det_transforms import build_detector_augmentations


class TestDetectorTrain:

    def test_one_step_tiny(self):
        size = 64
        model = SSDDetector(num_classes=9, width_mult=0.5)
        opt = optax.inject_hyperparams(
            lambda learning_rate: optax.sgd(learning_rate, momentum=0.9))(
            learning_rate=0.01)
        state = create_detector_state(model, opt, jax.random.PRNGKey(0),
                                      input_size=size, batch=2)
        anchors = jnp.asarray(generate_anchors(size))

        # build a train step against the tiny anchor set
        from functools import partial

        @partial(jax.jit, donate_argnums=(0,))
        def step(state, imgs, boxes, labels, valid):
            def loss_fn(trainable):
                (logits, deltas), mut = model.apply(
                    {'params': trainable['model'],
                     'batch_stats': state.batch_stats},
                    imgs, train=True, mutable=['batch_stats'])
                total, parts = ssd_loss(logits, deltas, anchors, boxes,
                                        labels, valid,
                                        balance_params=(
                                            trainable['balance']['s_cls'],
                                            trainable['balance']['s_reg']))
                return total, (mut['batch_stats'], parts)

            trainable = {'model': state.params, 'balance': state.balance}
            (total, (bs, parts)), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(trainable)
            updates, new_opt = opt.update(grads, state.opt_state, trainable)
            new = optax.apply_updates(trainable, updates)
            return state.replace(params=new['model'], balance=new['balance'],
                                 batch_stats=bs, opt_state=new_opt,
                                 step=state.step + 1), total

        ds = SyntheticDetection(length=4, input_size=size, max_boxes=4)
        imgs = np.stack([ds[i][0] for i in range(2)])
        boxes = np.stack([ds[i][1] for i in range(2)])
        labels = np.stack([ds[i][2] for i in range(2)])
        valid = np.stack([ds[i][3] for i in range(2)])

        aug = jax.jit(build_detector_augmentations())
        imgs_d, boxes_d = aug(jnp.asarray(imgs), jnp.asarray(boxes),
                              jax.random.PRNGKey(0))
        losses = []
        for i in range(3):
            state, total = step(state, imgs_d, jnp.asarray(boxes_d),
                                jnp.asarray(labels), jnp.asarray(valid))
            losses.append(float(total))
        assert all(np.isfinite(l) for l in losses)
        assert int(np.asarray(state.step)) == 3

    def test_warmup_lr(self):
        lr = warmup_step_lr(base_lr=0.05, warmup_iters=100, warmup_ratio=1/3,
                            milestones=(2,), gamma=0.1, steps_per_epoch=100)
        assert abs(float(lr(0)) - 0.05 / 3) < 1e-6
        assert abs(float(lr(100)) - 0.05) < 1e-6
        assert abs(float(lr(250)) - 0.005) < 1e-6  # past milestone 2*100
