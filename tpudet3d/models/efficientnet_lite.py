"""EfficientNet-lite backbones (0/1/2) in Flax, NHWC.

Capability parity with the reference's ``efficientnet_lite_pytorch``
dependency (used via torchdet3d/builders/model_builder.py:28-40).  The lite
family is EfficientNet with: no squeeze-excite, ReLU6 everywhere, and the
stem (32) / head (1280) channels plus first/last stage depths exempt from
compound scaling.  Output feature dim is 1280 for all lite variants.
"""

import math
from typing import Any, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from .layers import ConvBN, global_pool

__all__ = ['EfficientNetLite', 'EFFNET_LITE_PARAMS']

# (width_mult, depth_mult, resolution, dropout)
EFFNET_LITE_PARAMS = {
    'efficientnet-lite0': (1.0, 1.0, 224, 0.2),
    'efficientnet-lite1': (1.0, 1.1, 240, 0.2),
    'efficientnet-lite2': (1.1, 1.2, 260, 0.3),
}

# base (B0) stage config: (expand, channels, repeats, stride, kernel)
_B0_STAGES: Sequence[Tuple] = (
    (1, 16, 1, 1, 3),
    (6, 24, 2, 2, 3),
    (6, 40, 2, 2, 5),
    (6, 80, 3, 2, 3),
    (6, 112, 3, 1, 5),
    (6, 192, 4, 2, 5),
    (6, 320, 1, 1, 3),
)


def _round_filters(filters, width_mult, divisor=8):
    filters *= width_mult
    new_f = max(divisor, int(filters + divisor / 2) // divisor * divisor)
    if new_f < 0.9 * filters:
        new_f += divisor
    return int(new_f)


def _round_repeats(repeats, depth_mult):
    return int(math.ceil(depth_mult * repeats))


class _MBConvLite(nn.Module):
    """MBConv without SE, ReLU6 activations."""
    in_channels: int
    out_channels: int
    expand: int
    kernel_size: int
    strides: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        identity = self.strides == 1 and self.in_channels == self.out_channels
        hidden = self.in_channels * self.expand
        y = x
        if self.expand != 1:
            y = ConvBN(hidden, 1, 1, act=nn.relu6, dtype=self.dtype)(y, train)
        y = ConvBN(hidden, self.kernel_size, self.strides, groups=hidden,
                   act=nn.relu6, dtype=self.dtype)(y, train)
        y = ConvBN(self.out_channels, 1, 1, act=None, dtype=self.dtype)(y, train)
        return x + y if identity else y


class EfficientNetLite(nn.Module):
    width_mult: float = 1.0
    depth_mult: float = 1.0
    dtype: Any = jnp.float32

    feature_dim: int = 1280  # head channels are never width-scaled in lite

    def setup(self):
        blocks = [ConvBN(32, 3, 2, act=nn.relu6, dtype=self.dtype)]  # fixed stem
        in_ch = 32
        n_stages = len(_B0_STAGES)
        for stage_idx, (expand, channels, repeats, stride, kernel) in enumerate(_B0_STAGES):
            out_ch = _round_filters(channels, self.width_mult)
            if stage_idx in (0, n_stages - 1):
                reps = repeats  # first/last stage depth not scaled (lite rule)
            else:
                reps = _round_repeats(repeats, self.depth_mult)
            for i in range(reps):
                blocks.append(_MBConvLite(in_ch, out_ch, expand, kernel,
                                          stride if i == 0 else 1,
                                          dtype=self.dtype))
                in_ch = out_ch
        blocks.append(ConvBN(self.feature_dim, 1, 1, act=nn.relu6,
                             dtype=self.dtype))  # fixed head
        self.blocks = blocks

    def features(self, x, train: bool = False):
        for block in self.blocks:
            x = block(x, train)
        return x

    def head(self, pooled, train: bool = False):
        return pooled  # conv head already applied pre-pool

    def __call__(self, x, train: bool = False, pooling_mode: str = 'avg'):
        return global_pool(self.features(x, train), pooling_mode)
