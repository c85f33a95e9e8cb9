"""Builder matrix sweep (mirrors reference tests/test_pipeline.py:32-48):
every loss × optimizer × scheduler constructible from the default config."""

import os.path as osp

import jax
import jax.numpy as jnp
import numpy as np

from tpudet3d.core import read_py_config
from tpudet3d.losses import build_loss, AVAILABLE_LOSS, LossManager
from tpudet3d.train.optim import (build_optimizer, build_scheduler,
                                  AVAILABLE_OPTIMS, AVAILABLE_SCHEDS)

CONFIG_PATH = osp.join(osp.dirname(__file__), '..', 'configs',
                       'default_config.py')


class TestBuilders:

    def _config(self):
        return read_py_config(CONFIG_PATH)

    def test_loss_builders(self):
        cfg = self._config()
        for loss_ in AVAILABLE_LOSS:
            if loss_ == 'cross_entropy':
                continue
            cfg.loss.names = [loss_, 'cross_entropy']
            cfg.loss.coeffs = ([1.], [1.])
            regress, cls = build_loss(cfg)
            assert len(regress) == 1 and len(cls) == 1
            pred = jnp.zeros((4, 9, 2)) + 0.4
            gt = jnp.zeros((4, 9, 2)) + 0.6
            val = regress[0](pred, gt)
            assert np.isfinite(float(val))

    def test_optimizer_scheduler_matrix(self):
        cfg = self._config()
        params = {'w': jnp.zeros((8, 8))}
        for optim_ in AVAILABLE_OPTIMS:
            cfg.optim.name = optim_
            opt = build_optimizer(cfg)
            state = opt.init(params)
            assert state is not None
            grads = {'w': jnp.ones((8, 8))}
            updates, _ = opt.update(grads, state, params)
            assert np.all(np.isfinite(np.asarray(updates['w'])))
            for sched in AVAILABLE_SCHEDS:
                cfg.scheduler.name = sched
                lr_fn = build_scheduler(cfg)
                assert lr_fn is not None
                lrs = [lr_fn(e) for e in range(0, int(cfg.data.max_epochs), 10)]
                assert all(np.isfinite(v) and v >= 0 for v in lrs)
                # schedules never increase for these configs
                assert lrs[0] >= lrs[-1]

    def test_multistep_matches_reference_semantics(self):
        cfg = self._config()
        cfg.scheduler.name = 'multistepLR'
        lr_fn = build_scheduler(cfg)
        lr0 = float(cfg.optim.lr)
        gamma = float(cfg.scheduler.gamma)
        assert abs(lr_fn(0) - lr0) < 1e-12
        assert abs(lr_fn(60) - lr0 * gamma) < 1e-12
        assert abs(lr_fn(95) - lr0 * gamma ** 2) < 1e-12
        assert abs(lr_fn(125) - lr0 * gamma ** 3) < 1e-12

    def test_alwa_config_plumbs(self):
        cfg = self._config()
        cfg.loss.alwa.use = True
        cfg.loss.coeffs = ([1.], [1.])
        cfg.loss.names = ['l1', 'cross_entropy']
        lm = LossManager(build_loss(cfg), cfg.loss.coeffs, cfg.loss.alwa)
        state = lm.init_state()
        assert float(state.lam_cls) == 1.0
