"""MobileNetV2 backbone (NHWC Flax) for the SSD detector stage.

The reference trains its 2D detector in an external mmdetection fork with a
``mobilenetv2_w1`` backbone, ``out_indices=(4, 5)`` → feature maps at
strides 16 (96ch) and 32 (320ch) on a 300² input
(/root/reference/configs/detection/mnv2_ssd_300_2_heads.py:7-18).  This
framework owns the whole stage (SURVEY.md §7 step 4).
"""

from typing import Any, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from .layers import ConvBN, make_divisible

__all__ = ['MobileNetV2', 'MNV2_CFG']

# (expand_ratio, channels, repeats, first_stride)
MNV2_CFG: Sequence[Tuple] = (
    (1, 16, 1, 1),
    (6, 24, 2, 2),
    (6, 32, 3, 2),
    (6, 64, 4, 2),
    (6, 96, 3, 1),    # stage index 4 → stride 16
    (6, 160, 3, 2),
    (6, 320, 1, 1),   # stage index 6 → stride 32
)


class _MBConv(nn.Module):
    in_channels: int
    out_channels: int
    expand: int
    strides: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        hidden = self.in_channels * self.expand
        identity = self.strides == 1 and self.in_channels == self.out_channels
        y = x
        if self.expand != 1:
            y = ConvBN(hidden, 1, 1, act=nn.relu6, dtype=self.dtype)(y, train)
        y = ConvBN(hidden, 3, self.strides, groups=hidden, act=nn.relu6,
                   dtype=self.dtype)(y, train)
        y = ConvBN(self.out_channels, 1, 1, act=None, dtype=self.dtype)(y, train)
        return x + y if identity else y


class MobileNetV2(nn.Module):
    """Returns the feature maps at the requested stage indices.

    Stage numbering: stage i = the i-th entry of MNV2_CFG (stem excluded),
    so out_stages=(4, 6) gives the stride-16 (96ch) and stride-32 (320ch)
    maps — the '(4, 5)' of the reference's 7-stage mmdet indexing.
    """
    width_mult: float = 1.0
    out_stages: Tuple[int, ...] = (4, 6)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        cin = make_divisible(32 * self.width_mult, 8)
        x = ConvBN(cin, 3, 2, act=nn.relu6, dtype=self.dtype)(x, train)
        outs = []
        for stage_idx, (t, c, n, s) in enumerate(MNV2_CFG):
            cout = make_divisible(c * self.width_mult, 8)
            for i in range(n):
                x = _MBConv(cin, cout, t, s if i == 0 else 1,
                            dtype=self.dtype)(x, train)
                cin = cout
            if stage_idx in self.out_stages:
                outs.append(x)
        return tuple(outs)

    @property
    def out_channels(self):
        return tuple(make_divisible(MNV2_CFG[i][1] * self.width_mult, 8)
                     for i in self.out_stages)
