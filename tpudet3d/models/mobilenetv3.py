"""MobileNetV3 backbones in Flax (NHWC).

Architecture parity with the reference tables
(torchdet3d/models/mobilenetv3.py:20-52, 169-203): same (kernel, expand,
channels, SE, HS, stride) schedule, hard-swish stem, 1x1 expansion conv at
the end of the feature extractor and a post-pool dense head
(Dense → BatchNorm → hard-swish, reference :191-195).

``mobilenetv3_large_21k`` is the same large trunk (the reference wraps
timm's mobilenetv3_large_100 initialized from ImageNet-21k,
mobilenetv3.py:224-231); pretrained-weight import is handled separately by
tpudet3d.utils.torch_import.

The backbone interface used by the multi-head wrapper is
``__call__(x, train, pooling_mode) -> [B, feature_dim]``: spatial features →
global pool → post-pool head, all inside one jitted graph.
"""

from typing import Any, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from .layers import (ConvBN, InvertedResidual, hard_swish, make_divisible,
                     global_pool)

__all__ = ['MobileNetV3', 'MNV3_LARGE_CFG', 'MNV3_SMALL_CFG', 'model_params']

# (kernel, expand_ratio, channels, use_se, use_hs, stride)
MNV3_LARGE_CFG: Sequence[Tuple] = (
    (3, 1, 16, 0, 0, 1),
    (3, 4, 24, 0, 0, 2),
    (3, 3, 24, 0, 0, 1),
    (5, 3, 40, 1, 0, 2),
    (5, 3, 40, 1, 0, 1),
    (5, 3, 40, 1, 0, 1),
    (3, 6, 80, 0, 1, 2),
    (3, 2.5, 80, 0, 1, 1),
    (3, 2.3, 80, 0, 1, 1),
    (3, 2.3, 80, 0, 1, 1),
    (3, 6, 112, 1, 1, 1),
    (3, 6, 112, 1, 1, 1),
    (5, 6, 160, 1, 1, 2),
    (5, 6, 160, 1, 1, 1),
    (5, 6, 160, 1, 1, 1),
)

MNV3_SMALL_CFG: Sequence[Tuple] = (
    (3, 1, 16, 1, 0, 2),
    (3, 4.5, 24, 0, 0, 2),
    (3, 3.67, 24, 0, 0, 1),
    (5, 4, 40, 1, 1, 2),
    (5, 6, 40, 1, 1, 1),
    (5, 6, 40, 1, 1, 1),
    (5, 3, 48, 1, 1, 1),
    (5, 3, 48, 1, 1, 1),
    (5, 6, 96, 1, 1, 2),
    (5, 6, 96, 1, 1, 1),
    (5, 6, 96, 1, 1, 1),
)

model_params = {
    'mobilenetv3_large': dict(cfgs=MNV3_LARGE_CFG, mode='large'),
    'mobilenetv3_small': dict(cfgs=MNV3_SMALL_CFG, mode='small'),
    # the 21k variant is architecturally timm's mobilenetv3_large_100 (the
    # reference wraps the real timm module, mobilenetv3.py:224-231): SE after
    # the post-depthwise activation and a BN-free post-pool head, so the MIIL
    # ImageNet-21k checkpoint maps onto it with matching semantics.
    'mobilenetv3_large_21k': dict(cfgs=MNV3_LARGE_CFG, mode='large',
                                  timm_arch=True),
}


class MobileNetV3(nn.Module):
    cfgs: Sequence[Tuple] = MNV3_LARGE_CFG
    mode: str = 'large'
    width_mult: float = 1.0
    timm_arch: bool = False
    dtype: Any = jnp.float32

    @property
    def feature_dim(self):
        base = {'large': 1280, 'small': 1024}[self.mode]
        return (make_divisible(base * self.width_mult, 8)
                if self.width_mult > 1.0 else base)

    def setup(self):
        input_channel = make_divisible(16 * self.width_mult, 8)
        blocks = [ConvBN(input_channel, 3, 2, act=hard_swish, dtype=self.dtype)]
        exp_size = input_channel
        for k, t, c, use_se, use_hs, s in self.cfgs:
            out_channel = make_divisible(c * self.width_mult, 8)
            exp_size = make_divisible(input_channel * t, 8)
            blocks.append(InvertedResidual(
                input_channel, exp_size, out_channel, int(k), int(s),
                bool(use_se), bool(use_hs), se_after_act=self.timm_arch,
                dtype=self.dtype))
            input_channel = out_channel
        # final 1x1 expansion (reference conv_1x1_bn, mobilenetv3.py:188)
        blocks.append(ConvBN(exp_size, 1, 1, act=hard_swish, dtype=self.dtype))
        self.blocks = blocks
        self.head_dense = nn.Dense(self.feature_dim, dtype=self.dtype)
        if not self.timm_arch:
            self.head_bn = nn.BatchNorm(momentum=0.9, epsilon=1e-5,
                                        dtype=self.dtype)

    def features(self, x, train: bool = False):
        for block in self.blocks:
            x = block(x, train)
        return x

    def head(self, pooled, train: bool = False):
        """Post-pool trunk: Dense → BN → h-swish (reference :191-195); the
        timm variant is conv_head → h-swish with no BN (timm MobileNetV3
        head, consumed by the reference via forward_features)."""
        y = self.head_dense(pooled)
        if not self.timm_arch:
            y = self.head_bn(y, use_running_average=not train)
        return hard_swish(y)

    def __call__(self, x, train: bool = False, pooling_mode: str = 'avg'):
        feats = self.features(x, train)
        pooled = global_pool(feats, pooling_mode)
        return self.head(pooled, train)
