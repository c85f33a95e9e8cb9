"""Model tests (mirrors reference tests/test_pipeline.py:50-55 with small
shapes — 224² x 128 is too slow for a 1-core CPU CI)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tpudet3d.core import AttrDict
from tpudet3d.models import (build_model, build_backbone, MultiHeadRegressor,
                             MobileNetV3, MNV3_SMALL_CFG)


def small_cfg(name='mobilenetv3_small', num_classes=9):
    return AttrDict(model=dict(name=name, pretrained=False,
                               num_classes=num_classes, bf16=False))


class TestModels:

    def test_random_inference_shapes(self):
        model = build_model(small_cfg())
        key = jax.random.PRNGKey(0)
        x = jnp.zeros((4, 64, 64, 3), jnp.float32)
        cats = jnp.asarray([0, 3, 8, 5], jnp.int32)
        variables = model.init({'params': key, 'dropout': key}, x, cats)
        kp, logits = model.apply(variables, x, cats, train=False)
        assert kp.shape == (4, 9, 2)
        assert logits.shape == (4, 9)
        assert np.all((np.asarray(kp) >= 0) & (np.asarray(kp) <= 1))

    def test_export_mode_all_heads(self):
        model = build_model(small_cfg())
        key = jax.random.PRNGKey(0)
        x = jnp.zeros((2, 64, 64, 3), jnp.float32)
        cats = jnp.asarray([0, 1], jnp.int32)
        variables = model.init({'params': key, 'dropout': key}, x, cats)
        kp, logits = model.apply(variables, x, export=True)
        assert kp.shape == (9, 2, 9, 2)   # [heads, B, 9, 2] like the reference
        assert logits.shape == (2, 9)

    def test_head_select_matches_export(self):
        """The train-path one-hot head selection must agree with the export
        all-heads graph row-by-row."""
        model = build_model(small_cfg())
        key = jax.random.PRNGKey(1)
        x = jax.random.normal(key, (3, 64, 64, 3))
        cats = jnp.asarray([2, 7, 4], jnp.int32)
        variables = model.init({'params': key, 'dropout': key}, x, cats)
        kp_sel, _ = model.apply(variables, x, cats, train=False)
        kp_all, _ = model.apply(variables, x, export=True)
        for i, c in enumerate([2, 7, 4]):
            assert np.allclose(np.asarray(kp_sel[i]), np.asarray(kp_all[c, i]),
                               atol=1e-5)

    @pytest.mark.parametrize('name', ['mobilenetv3_large', 'mobilenetv3_small',
                                      'efficientnet-lite0'])
    def test_backbones_build(self, name):
        backbone = build_backbone(name)
        key = jax.random.PRNGKey(0)
        x = jnp.zeros((1, 64, 64, 3), jnp.float32)
        variables = backbone.init(key, x)
        out = backbone.apply(variables, x)
        assert out.shape == (1, backbone.feature_dim)

    def test_single_class_logits_passthrough(self):
        model = build_model(small_cfg(num_classes=1))
        key = jax.random.PRNGKey(0)
        x = jnp.zeros((2, 64, 64, 3), jnp.float32)
        cats = jnp.asarray([0, 0], jnp.int32)
        variables = model.init({'params': key, 'dropout': key}, x, cats)
        kp, logits = model.apply(variables, x, cats, train=False)
        assert kp.shape == (2, 9, 2) and logits.shape == (2, 1)
