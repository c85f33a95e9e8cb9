"""Shared Flax building blocks (NHWC, MXU-friendly).

Functional re-derivations of the blocks used by the reference backbones
(torchdet3d/models/mobilenetv3.py:74-166): hard-sigmoid/hard-swish,
squeeze-excite, conv-bn fusion-friendly stacks and inverted residuals.
Layout is NHWC and compute dtype is configurable (bfloat16 on TPU) with
float32 parameters — XLA fuses the BN+activation chains into the convs.
"""

from typing import Any, Callable, Optional

import jax.numpy as jnp
from flax import linen as nn

__all__ = ['make_divisible', 'hard_sigmoid', 'hard_swish', 'ConvBN',
           'SqueezeExcite', 'InvertedResidual', 'global_pool']


def make_divisible(v, divisor=8, min_value=None):
    """Round channels to a multiple of ``divisor`` (tf slim convention,
    reference mobilenetv3.py:54-71)."""
    if min_value is None:
        min_value = divisor
    new_v = max(min_value, int(v + divisor / 2) // divisor * divisor)
    if new_v < 0.9 * v:
        new_v += divisor
    return new_v


def hard_sigmoid(x):
    return nn.relu6(x + 3.0) / 6.0


def hard_swish(x):
    return x * hard_sigmoid(x)


def global_pool(x, mode='avg'):
    """[B,H,W,C] → [B,C] (reference model_builder.py:95-110 pooling modes)."""
    if mode == 'avg':
        return jnp.mean(x, axis=(1, 2))
    if mode == 'max':
        return jnp.max(x, axis=(1, 2))
    if mode == 'avg+max':
        return jnp.mean(x, axis=(1, 2)) + jnp.max(x, axis=(1, 2))
    raise ValueError(f'Unknown pooling mode: {mode}')


class ConvBN(nn.Module):
    """Conv → BatchNorm → activation, NHWC."""
    features: int
    kernel_size: int = 3
    strides: int = 1
    groups: int = 1
    act: Optional[Callable] = hard_swish
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        pad = (self.kernel_size - 1) // 2
        x = nn.Conv(self.features, (self.kernel_size, self.kernel_size),
                    strides=(self.strides, self.strides),
                    padding=[(pad, pad), (pad, pad)],
                    feature_group_count=self.groups, use_bias=False,
                    dtype=self.dtype)(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype)(x)
        if self.act is not None:
            x = self.act(x)
        return x


class SqueezeExcite(nn.Module):
    """SE block with hard-sigmoid gate (reference mobilenetv3.py:92-107)."""
    channels: int
    reduction: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        hidden = make_divisible(self.channels // self.reduction, 8)
        y = jnp.mean(x, axis=(1, 2))
        y = nn.Dense(hidden, dtype=self.dtype)(y)
        y = nn.relu(y)
        y = nn.Dense(self.channels, dtype=self.dtype)(y)
        y = hard_sigmoid(y)
        return x * y[:, None, None, :]


class InvertedResidual(nn.Module):
    """MobileNet inverted residual (reference mobilenetv3.py:126-166).

    expand 1x1 (skipped when exp == in) → depthwise kxk → optional SE →
    project 1x1; identity skip when stride 1 and in == out.

    ``se_after_act``: apply SE after the post-depthwise activation (the
    published timm/TF ordering used by the reference's 21k variant,
    mobilenetv3.py:224-231) instead of the d-li14 ordering (SE between the
    depthwise BN and the activation, reference :151-162).
    """
    in_channels: int
    hidden_dim: int
    out_channels: int
    kernel_size: int
    strides: int
    use_se: bool
    use_hs: bool
    se_after_act: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        act = hard_swish if self.use_hs else nn.relu
        identity = self.strides == 1 and self.in_channels == self.out_channels
        y = x
        if self.in_channels != self.hidden_dim:
            y = ConvBN(self.hidden_dim, 1, 1, act=act, dtype=self.dtype)(y, train)
        y = ConvBN(self.hidden_dim, self.kernel_size, self.strides,
                   groups=self.hidden_dim, act=None, dtype=self.dtype)(y, train)
        if self.in_channels == self.hidden_dim or self.se_after_act:
            # dw-first variant (reference :134-144) and the timm ordering
            # both activate first, then squeeze-excite
            y = act(y)
            if self.use_se:
                y = SqueezeExcite(self.hidden_dim, dtype=self.dtype)(y)
        else:
            if self.use_se:
                y = SqueezeExcite(self.hidden_dim, dtype=self.dtype)(y)
            y = act(y)
        y = ConvBN(self.out_channels, 1, 1, act=None, dtype=self.dtype)(y, train)
        return x + y if identity else y
