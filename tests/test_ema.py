"""Weight EMA (optim.ema_decay) — in-step average, eval selection, resume.

Net-new vs the reference (no weight averaging there): the average is
maintained inside the jitted train step (train/steps.py) and preferred by
validation/serving via tpudet3d.train.state.eval_params.
"""

import numpy as np
import jax
import pytest

from tpudet3d.train.pipeline import setup_training
from tpudet3d.train.state import eval_params
from tpudet3d.utils import save_snap, resume_from

from test_train_e2e import tiny_cfg


def _first_leaf(tree):
    return np.asarray(jax.tree_util.tree_leaves(jax.device_get(tree))[0],
                      np.float64)


class TestEMA:
    def test_disabled_by_default(self, tmp_path):
        pipe = setup_training(tiny_cfg(tmp_path, batch=8),
                              with_loaders=False)
        assert pipe.state.ema_params is None
        assert eval_params(pipe.state) is pipe.state.params

    def test_ema_recursion_and_eval_selection(self, tmp_path):
        cfg = tiny_cfg(tmp_path, batch=8)
        cfg.data.synthetic_length = 8
        decay = 0.9
        cfg.optim.ema_decay = decay
        pipe = setup_training(cfg)

        state = pipe.state
        # initialized to a copy of the params
        assert np.allclose(_first_leaf(state.ema_params),
                           _first_leaf(state.params))

        imgs, kps, cats, _ = next(iter(pipe.train_loader))
        imgs_d, kps_d, cats_d = map(pipe.put_fn, (imgs, kps, cats))
        expected = _first_leaf(state.params)
        for i in range(3):
            state, _ = pipe.train_step(state, imgs_d, kps_d, cats_d,
                                       jax.random.PRNGKey(i))
            expected = decay * expected + (1 - decay) * _first_leaf(
                state.params)
        got = _first_leaf(state.ema_params)
        assert np.allclose(got, expected, atol=1e-5), \
            np.abs(got - expected).max()
        # the average lags the raw params and is what eval selects
        assert not np.allclose(got, _first_leaf(state.params))
        assert eval_params(state) is state.ema_params

    def test_detector_ema_recursion(self):
        import optax
        from tpudet3d.detect import SSDDetector
        from tpudet3d.detect.train import (create_detector_state,
                                           make_detector_train_step)
        size, decay = 64, 0.9
        model = SSDDetector(num_classes=9, width_mult=0.5)
        opt = optax.inject_hyperparams(
            lambda learning_rate: optax.sgd(learning_rate, momentum=0.9))(
            learning_rate=0.01)
        state = create_detector_state(model, opt, jax.random.PRNGKey(0),
                                      input_size=size, batch=2,
                                      ema_decay=decay)
        assert np.allclose(_first_leaf(state.ema_params),
                           _first_leaf(state.params))
        step = make_detector_train_step(model, opt, input_size=size,
                                        ema_decay=decay)
        imgs = jax.random.uniform(jax.random.PRNGKey(1), (2, size, size, 3))
        boxes = np.tile(np.asarray([[4., 4., 40., 40.]], np.float32),
                        (2, 4, 1))
        labels = np.zeros((2, 4), np.int32)
        valid = np.ones((2, 4), bool)
        expected = _first_leaf(state.params)
        for i in range(2):
            state, _ = step(state, imgs, boxes, labels, valid)
            expected = decay * expected + (1 - decay) * _first_leaf(
                state.params)
        assert np.allclose(_first_leaf(state.ema_params), expected,
                           atol=1e-5)

    def test_ema_checkpoint_roundtrip(self, tmp_path):
        cfg = tiny_cfg(tmp_path, batch=8)
        cfg.data.synthetic_length = 8
        cfg.optim.ema_decay = 0.9
        pipe = setup_training(cfg)
        imgs, kps, cats, _ = next(iter(pipe.train_loader))
        imgs_d, kps_d, cats_d = map(pipe.put_fn, (imgs, kps, cats))
        state, _ = pipe.train_step(pipe.state, imgs_d, kps_d, cats_d,
                                   jax.random.PRNGKey(0))
        save_snap(state, 0, str(tmp_path))
        fresh = setup_training(cfg, with_loaders=False)
        restored, start_epoch = resume_from(
            fresh.state, str(tmp_path / 'snap_0'))
        assert start_epoch == 1
        assert np.allclose(_first_leaf(restored.ema_params),
                           _first_leaf(state.ema_params))


class TestPreEmaSnapshotResume:
    """Round-3 regression: snapshots saved BEFORE the ema_params field
    existed must still restore their batch_stats.  The template-based
    full restore fails on the structure mismatch and the tolerant
    fallback used to return params-only — serving init BN statistics
    (mean 0 / var 1) silently wrecked every downstream prediction."""

    def _old_style_snapshot(self, tmp_path, state, epoch=3):
        import orbax.checkpoint as ocp
        import os.path as osp
        saved = {
            'params': jax.device_get(state.params),
            'batch_stats': jax.device_get(state.batch_stats),
            'opt_state': jax.device_get(state.opt_state),
            'alwa': jax.device_get(state.alwa),
            'step': jax.device_get(state.step),
        }   # no ema_params key: the pre-EMA on-disk layout
        path = osp.join(str(tmp_path), 'snap_old')
        with ocp.StandardCheckpointer() as ckptr:
            ckptr.save(path, {'state': saved, 'epoch': epoch}, force=True)
        return path

    def test_batch_stats_survive_fallback(self, tmp_path):
        pipe = setup_training(tiny_cfg(tmp_path, batch=8),
                              with_loaders=False)
        # mutate params, batch_stats AND opt_state so restoration is
        # observable per field
        trained = pipe.state.replace(
            params=jax.tree_util.tree_map(lambda x: x + 1.0,
                                          pipe.state.params),
            batch_stats=jax.tree_util.tree_map(lambda x: x + 2.0,
                                               pipe.state.batch_stats),
            opt_state=jax.tree_util.tree_map(
                lambda x: x + 3.0 if np.issubdtype(
                    np.asarray(x).dtype, np.floating) else x,
                pipe.state.opt_state))
        path = self._old_style_snapshot(tmp_path, trained)

        fresh = setup_training(tiny_cfg(tmp_path, batch=8),
                               with_loaders=False).state
        restored, start_epoch = resume_from(fresh, path)
        assert start_epoch == 4
        assert np.allclose(_first_leaf(restored.params),
                           _first_leaf(trained.params))
        assert np.allclose(_first_leaf(restored.batch_stats),
                           _first_leaf(trained.batch_stats))
        # the ema-field-toggled second attempt is a FULL restore: the
        # optimizer state survives too (the plain fallback would drop it)
        t_opt = [x for x in jax.tree_util.tree_leaves(
            jax.device_get(trained.opt_state))
            if np.issubdtype(np.asarray(x).dtype, np.floating)]
        r_opt = [x for x in jax.tree_util.tree_leaves(
            jax.device_get(restored.opt_state))
            if np.issubdtype(np.asarray(x).dtype, np.floating)]
        assert t_opt and np.allclose(np.asarray(t_opt[0]),
                                     np.asarray(r_opt[0]))

    def test_ema_template_seeds_from_weights(self, tmp_path):
        pipe = setup_training(tiny_cfg(tmp_path, batch=8),
                              with_loaders=False)
        trained = pipe.state.replace(
            params=jax.tree_util.tree_map(lambda x: x + 1.0,
                                          pipe.state.params))
        path = self._old_style_snapshot(tmp_path, trained)

        cfg = tiny_cfg(tmp_path, batch=8)
        cfg.optim.ema_decay = 0.99
        fresh = setup_training(cfg, with_loaders=False).state
        restored, _ = resume_from(fresh, path)
        # the EMA average starts from the RESTORED weights, not the inits
        assert np.allclose(_first_leaf(restored.ema_params),
                           _first_leaf(trained.params))
        assert np.allclose(_first_leaf(eval_params(restored)),
                           _first_leaf(trained.params))

    def test_ema_snapshot_into_disabled_config(self, tmp_path):
        """EMA-trained snapshot resumed with ema_decay unset: full restore
        (optimizer state included) with the average dropped."""
        import orbax.checkpoint as ocp
        import os.path as osp
        cfg = tiny_cfg(tmp_path, batch=8)
        cfg.optim.ema_decay = 0.99
        ema_state = setup_training(cfg, with_loaders=False).state
        trained = ema_state.replace(
            params=jax.tree_util.tree_map(lambda x: x + 1.0,
                                          ema_state.params),
            batch_stats=jax.tree_util.tree_map(lambda x: x + 2.0,
                                               ema_state.batch_stats),
            opt_state=jax.tree_util.tree_map(
                lambda x: x + 3.0 if np.issubdtype(
                    np.asarray(x).dtype, np.floating) else x,
                ema_state.opt_state))
        path = osp.join(str(tmp_path), 'snap_ema')
        with ocp.StandardCheckpointer() as ckptr:
            ckptr.save(path, {'state': jax.device_get(trained), 'epoch': 7},
                       force=True)

        fresh = setup_training(tiny_cfg(tmp_path, batch=8),
                               with_loaders=False).state
        assert fresh.ema_params is None
        restored, start_epoch = resume_from(fresh, path)
        assert start_epoch == 8
        assert restored.ema_params is None
        assert np.allclose(_first_leaf(restored.params),
                           _first_leaf(trained.params))
        assert np.allclose(_first_leaf(restored.batch_stats),
                           _first_leaf(trained.batch_stats))
        t_opt = [x for x in jax.tree_util.tree_leaves(
            jax.device_get(trained.opt_state))
            if np.issubdtype(np.asarray(x).dtype, np.floating)]
        r_opt = [x for x in jax.tree_util.tree_leaves(
            jax.device_get(restored.opt_state))
            if np.issubdtype(np.asarray(x).dtype, np.floating)]
        assert t_opt and np.allclose(np.asarray(t_opt[0]),
                                     np.asarray(r_opt[0]))
