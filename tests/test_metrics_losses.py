"""Metric/loss tests (mirrors reference tests/test_pipeline.py:18-30)."""

import numpy as np
import jax
import jax.numpy as jnp

from tpudet3d.core import AttrDict
from tpudet3d.eval import (compute_metrics_per_cls, compute_average_distance,
                           compute_accuracy)
from tpudet3d.losses import (wing_loss, add_loss, diag_loss, l1_loss,
                             smooth_l1_loss, mse_loss, LossManager, build_loss)

RNG = np.random.RandomState(42)
GT_KPS = jnp.asarray(RNG.rand(128, 9, 2), jnp.float32)
TEST_KPS = jnp.asarray(RNG.rand(128, 9, 2), jnp.float32)
GT_CATS = jnp.asarray(RNG.randint(0, 9, (128,)), jnp.int32)
TEST_CATS = jnp.asarray(RNG.rand(128, 9), jnp.float32)


class TestMetrics:

    def test_metrics(self):
        cls_metrics, ADD, SADD, IOU, acc = compute_metrics_per_cls(
            TEST_KPS, GT_KPS, TEST_CATS, GT_CATS)
        assert 0 <= ADD <= 1 and 0 <= SADD <= 1 and 0 <= IOU <= 1 and 0 <= acc <= 1
        assert len(cls_metrics) == 9 and len(cls_metrics[0]) == 5

    def test_sadd_leq_add(self):
        add, sadd = compute_average_distance(TEST_KPS, GT_KPS)
        assert float(sadd) <= float(add) + 1e-6

    def test_accuracy_range(self):
        acc = compute_accuracy(TEST_CATS, GT_CATS)
        assert 0 <= float(acc) <= 1

    def test_per_class_totals_match_global(self):
        cls_metrics, ADD, _, _, _ = compute_metrics_per_cls(
            TEST_KPS, GT_KPS, TEST_CATS, GT_CATS, compute_iou=False)
        # weighted per-class ADD == global ADD
        counts = np.bincount(np.asarray(GT_CATS), minlength=9)
        weighted = sum(m[1] * counts[m[0]] for m in cls_metrics) / counts.sum()
        assert abs(weighted - ADD) < 1e-5


class TestLosses:

    def test_losses_no_nan_and_grads(self):
        key = jax.random.PRNGKey(0)
        inp = jax.nn.sigmoid(jax.random.normal(key, (512, 9, 2)))
        tgt = jax.nn.sigmoid(jax.random.normal(jax.random.PRNGKey(1), (512, 9, 2)))
        for loss in [wing_loss, add_loss, diag_loss, l1_loss, smooth_l1_loss, mse_loss]:
            val, grad = jax.value_and_grad(lambda x: loss(x, tgt))(inp)
            assert np.isfinite(float(val))
            assert np.all(np.isfinite(np.asarray(grad)))

    def test_loss_manager_plain(self):
        cfg = AttrDict(loss=dict(names=['l1', 'add_loss', 'cross_entropy'],
                                 coeffs=([1., .1], [.2]), smoothl1_beta=0.2,
                                 alwa=dict(use=False, lam_cls=1., lam_reg=1.,
                                           C=100, compute_std=True),
                                 w=5.18, eps=1.))
        criterions = build_loss(cfg)
        lm = LossManager(criterions, cfg.loss.coeffs, cfg.loss.alwa)
        state = lm.init_state()
        loss, state2 = lm.parse_losses(TEST_KPS, GT_KPS, TEST_CATS, GT_CATS, 0, state)
        expected = (l1_loss(TEST_KPS, GT_KPS) +
                    0.1 * add_loss(TEST_KPS, GT_KPS))
        assert float(loss) > float(expected) - 1e-6  # + CE term
        assert np.isfinite(float(loss))

    def test_loss_manager_alwa_updates_under_jit(self):
        cfg = AttrDict(loss=dict(names=['l1', 'cross_entropy'],
                                 coeffs=([1.], [1.]), smoothl1_beta=0.2,
                                 alwa=dict(use=True, lam_cls=1., lam_reg=1.,
                                           C=4, compute_std=True),
                                 w=5.18, eps=1.))
        criterions = build_loss(cfg)
        lm = LossManager(criterions, cfg.loss.coeffs, cfg.loss.alwa)
        state = lm.init_state()

        @jax.jit
        def step(state, it):
            # make cls loss dominate so ALWA must shrink lam_cls
            return lm.parse_losses(TEST_KPS, GT_KPS, 10 * TEST_CATS, GT_CATS,
                                   it, state)

        for it in range(9):
            loss, state = step(state, it)
        assert float(state.lam_cls) < 1.0
        assert np.isfinite(float(loss))
