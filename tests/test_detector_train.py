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

    def test_sharded_step_8_devices(self, devices):
        """Data-parallel SSD train step over the full 8-device mesh
        (reference capability: NCCL DDP in the external mmdet fork,
        configs/detection/mnv2_ssd_300_2_heads.py:165)."""
        from tpudet3d.parallel import make_mesh, replicate, shard_batch
        from tpudet3d.detect.train import make_detector_train_step

        size = 64
        mesh = make_mesh(devices)
        model = SSDDetector(num_classes=9, width_mult=0.5)
        opt = optax.sgd(0.01, momentum=0.9)
        state = create_detector_state(model, opt, jax.random.PRNGKey(0),
                                      input_size=size, batch=2)
        state = replicate(state, mesh)
        step = make_detector_train_step(model, opt, use_balance=True,
                                        input_size=size)

        batch = 16
        ds = SyntheticDetection(length=batch, input_size=size, max_boxes=4)
        items = [ds[i] for i in range(batch)]
        arrays = [shard_batch(np.stack([it[k] for it in items]), mesh)
                  for k in range(4)]
        # every input sharded over the data axis
        assert all(a.sharding.spec[0] == 'data' for a in arrays)

        prev = jax.device_get(state.params)
        state, metrics = step(state, *arrays)
        m = np.asarray(jax.device_get(metrics))
        assert np.all(np.isfinite(m)), m
        # params moved and stayed replicated
        new = jax.device_get(state.params)
        moved = any(not np.allclose(a, b) for a, b in zip(
            jax.tree_util.tree_leaves(prev), jax.tree_util.tree_leaves(new)))
        assert moved
        flat = jax.tree_util.tree_leaves(
            jax.tree_util.tree_map(lambda x: x.sharding.is_fully_replicated,
                                   state.params))
        assert all(flat)

        # second step reuses the compiled program and keeps improving state
        state, metrics2 = step(state, *arrays)
        assert np.all(np.isfinite(np.asarray(jax.device_get(metrics2))))


class TestDetBatchLoader:

    def test_cli_loader_assemble_signature(self):
        """Regression: the detector CLI's _DetBatchLoader must override
        _assemble with the SAME (indices, epoch) signature the BatchLoader
        producer calls with (the round-3 epoch-coherence fix changed the
        base call site and the override silently kept the old arity, which
        crashed every scripts/train_detector.py run at the first batch)."""
        import importlib.util
        import os.path as osp
        import sys
        spec = importlib.util.spec_from_file_location(
            'train_detector_cli',
            osp.join(osp.dirname(__file__), '..', 'scripts',
                     'train_detector.py'))
        mod = importlib.util.module_from_spec(spec)
        sys.modules['train_detector_cli'] = spec.loader.exec_module(mod) or mod
        from tpudet3d.data.det_host_transforms import (
            build_detection_host_pipeline)

        ds = SyntheticDetection(length=8, input_size=64, max_boxes=4)
        host_aug = build_detection_host_pipeline(input_size=64, enable=True,
                                                 seed=5)
        loader = mod._DetBatchLoader(ds, 4, shuffle=True, drop_last=True,
                                     num_threads=2,
                                     host_transform=host_aug)
        n = 0
        for imgs, boxes, labels, valid, true_n in loader:
            assert imgs.shape == (4, 64, 64, 3)
            assert boxes.shape == (4, 4, 4)
            assert labels.shape == (4, 4) and valid.shape == (4, 4)
            assert true_n == 4
            n += 1
        assert n == len(loader) == 2
        # second epoch (epoch threading through the pool workers)
        assert sum(1 for _ in loader) == 2
