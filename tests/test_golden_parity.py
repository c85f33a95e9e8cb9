"""Golden-number parity vs independent torch implementations.

SURVEY.md §4 calls for fixed-seed parity fixtures against the reference
math.  The vendor/reference code isn't importable here, so each check
re-derives the documented formula in torch (independent framework, float64)
and compares our jnp implementation to it.
"""

import math

import numpy as np
import pytest
import jax.numpy as jnp

torch = pytest.importorskip('torch')

from tpudet3d.losses import (wing_loss, add_loss, diag_loss, smooth_l1_loss,
                             cross_entropy_loss)
from tpudet3d.eval.metrics import compute_average_distance

RNG = np.random.RandomState(123)
PRED = RNG.rand(64, 9, 2).astype(np.float32)
GT = RNG.rand(64, 9, 2).astype(np.float32)


class TestLossParity:

    def test_wing(self):
        w, eps = 0.05, 2.0
        d = torch.abs(torch.tensor(PRED) - torch.tensor(GT))
        const = w - w * math.log(1 + w / eps)
        ref = torch.where(d < w, w * torch.log(1 + d / eps), d - const).mean()
        ours = float(wing_loss(jnp.asarray(PRED), jnp.asarray(GT), w=w, eps=eps))
        assert abs(ours - float(ref)) < 1e-6

    def test_add(self):
        diff = torch.tensor(PRED) - torch.tensor(GT)
        ref = torch.linalg.norm(diff, dim=2).sum(dim=1).mean()
        ours = float(add_loss(jnp.asarray(PRED), jnp.asarray(GT)))
        assert abs(ours - float(ref)) < 1e-5

    def test_diag(self):
        def diag(t):
            x0 = t[:, :, 0].min(dim=1).values
            y0 = t[:, :, 1].min(dim=1).values
            x1 = t[:, :, 0].max(dim=1).values
            y1 = t[:, :, 1].max(dim=1).values
            return torch.sqrt((x1 - x0) ** 2 + (y1 - y0) ** 2)
        ref = torch.nn.functional.smooth_l1_loss(
            diag(torch.tensor(PRED)), diag(torch.tensor(GT)), beta=0.4)
        ours = float(diag_loss(jnp.asarray(PRED), jnp.asarray(GT)))
        assert abs(ours - float(ref)) < 1e-6

    def test_smooth_l1(self):
        ref = torch.nn.functional.smooth_l1_loss(
            torch.tensor(PRED), torch.tensor(GT), beta=0.2)
        ours = float(smooth_l1_loss(jnp.asarray(PRED), jnp.asarray(GT),
                                    beta=0.2))
        assert abs(ours - float(ref)) < 1e-6

    def test_cross_entropy(self):
        logits = RNG.randn(32, 9).astype(np.float32)
        labels = RNG.randint(0, 9, 32)
        ref = torch.nn.functional.cross_entropy(
            torch.tensor(logits), torch.tensor(labels))
        ours = float(cross_entropy_loss(jnp.asarray(logits),
                                        jnp.asarray(labels)))
        assert abs(ours - float(ref)) < 1e-5


class TestMetricParity:

    def test_add_sadd(self):
        """Reference ADD/SADD semantics (metrics.py:10-29): ADD = mean L2
        over all keypoints; SADD takes per-pred-kp min over all GT kps."""
        p = torch.tensor(PRED)
        g = torch.tensor(GT)
        ref_add = torch.linalg.norm(p - g, dim=2).mean()
        sym = torch.zeros(p.shape[0])
        for i in range(9):
            dist = torch.linalg.norm(p[:, i] - g[:, i], dim=1)
            for j in range(9):
                d = torch.linalg.norm(p[:, i] - g[:, j], dim=1)
                dist = torch.where(d < dist, d, dist)
            sym += dist
        ref_sadd = (sym.mean() / 9).item()
        add, sadd = compute_average_distance(jnp.asarray(PRED),
                                             jnp.asarray(GT))
        assert abs(float(add) - float(ref_add)) < 1e-5
        assert abs(float(sadd) - ref_sadd) < 1e-5

    def test_reduce_sum_variant(self):
        add, sadd = compute_average_distance(jnp.asarray(PRED),
                                             jnp.asarray(GT),
                                             reduce_mean=False)
        p = torch.tensor(PRED)
        g = torch.tensor(GT)
        ref = (torch.linalg.norm(p - g, dim=2).sum() / 9).item()
        assert abs(float(add) - ref) < 1e-4
