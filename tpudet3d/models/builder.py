"""Model factory (reference torchdet3d/builders/model_builder.py:25-71).

Returns an uninitialized Flax module; parameter initialization happens in
the train/infer state constructors (functional JAX style).  Pretrained torch
checkpoints are imported by ``tpudet3d.utils.torch_import`` when
``config.model.load_weights`` / ``pretrained`` is set.
"""

from typing import Any

import jax.numpy as jnp

from .mobilenetv3 import MobileNetV3, model_params
from .efficientnet_lite import EfficientNetLite, EFFNET_LITE_PARAMS
from .wrapper import MultiHeadRegressor

__AVAI_MODELS__ = {
    'mobilenetv3_large', 'mobilenetv3_small', 'efficientnet-lite0',
    'efficientnet-lite1', 'efficientnet-lite2', 'mobilenetv3_large_21k',
}

__all__ = ['build_model', '__AVAI_MODELS__', 'build_backbone']


def build_backbone(name: str, dtype: Any = jnp.float32):
    assert name in __AVAI_MODELS__, \
        f'Wrong model name parameter. Expected one of {__AVAI_MODELS__}'
    if name.startswith('efficientnet'):
        width, depth, _res, _drop = EFFNET_LITE_PARAMS[name]
        return EfficientNetLite(width_mult=width, depth_mult=depth, dtype=dtype)
    params = model_params[name]
    return MobileNetV3(cfgs=tuple(tuple(c) for c in params['cfgs']),
                       mode=params['mode'],
                       timm_arch=params.get('timm_arch', False), dtype=dtype)


def build_model(config, export_mode: bool = False, dtype: Any = None):
    """Build the multi-head regressor module from a config.

    ``export_mode`` is accepted for CLI parity; the flax module exposes both
    paths via the ``export=`` call argument, so the same module object
    serves train and export graphs.
    """
    del export_mode
    if dtype is None:
        dtype = jnp.bfloat16 if config.model.get('bf16', False) else jnp.float32
    backbone = build_backbone(config.model.name, dtype=dtype)
    return MultiHeadRegressor(
        backbone=backbone,
        num_classes=int(config.model.num_classes or 9),
        pooling_mode=config.model.get('pooling_mode', 'avg'),
        dtype=dtype)
