from .layers import (make_divisible, hard_sigmoid, hard_swish, ConvBN,
                     SqueezeExcite, InvertedResidual, global_pool)
from .mobilenetv3 import MobileNetV3, MNV3_LARGE_CFG, MNV3_SMALL_CFG, model_params
from .efficientnet_lite import EfficientNetLite, EFFNET_LITE_PARAMS
from .wrapper import MultiHeadRegressor
from .builder import build_model, build_backbone, __AVAI_MODELS__

__all__ = [
    'make_divisible', 'hard_sigmoid', 'hard_swish', 'ConvBN', 'SqueezeExcite',
    'InvertedResidual', 'global_pool', 'MobileNetV3', 'MNV3_LARGE_CFG',
    'MNV3_SMALL_CFG', 'model_params', 'EfficientNetLite', 'EFFNET_LITE_PARAMS',
    'MultiHeadRegressor', 'build_model', 'build_backbone', '__AVAI_MODELS__',
]
