"""MobileNetV2-SSD-300 with 2 heads (Flax, NHWC).

The detector the reference delegates to an external mmdetection fork
(/root/reference/configs/detection/mnv2_ssd_300_2_heads.py): MNv2 trunk
features at strides 16/32, depthwise prediction heads
(3x3 DW conv → BN → ReLU → 1x1 conv), clustered anchors, softmax
classification with a background class (index == num_classes).
"""

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from ..models.mobilenetv2 import MobileNetV2
from ..models.layers import ConvBN
from .anchors import num_anchors_per_level

__all__ = ['SSDDetector']


class _DepthwiseHead(nn.Module):
    out_per_anchor: int
    num_anchors: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = x.shape[-1]
        y = ConvBN(c, 3, 1, groups=c, act=nn.relu, dtype=self.dtype)(x, train)
        y = nn.Conv(self.num_anchors * self.out_per_anchor, (1, 1),
                    dtype=self.dtype)(y)
        b = y.shape[0]
        return y.reshape(b, -1, self.out_per_anchor)   # [B, H*W*k, out]


class SSDDetector(nn.Module):
    num_classes: int = 9
    width_mult: float = 1.0
    dtype: Any = jnp.float32

    def setup(self):
        self.backbone = MobileNetV2(width_mult=self.width_mult,
                                    out_stages=(4, 6), dtype=self.dtype)
        ks = num_anchors_per_level()
        self.cls_heads = [
            _DepthwiseHead(self.num_classes + 1, k, dtype=self.dtype)
            for k in ks]
        self.reg_heads = [
            _DepthwiseHead(4, k, dtype=self.dtype) for k in ks]

    def __call__(self, x, train: bool = False):
        """x [B,300,300,3] → (cls_logits [B,A,C+1], bbox_deltas [B,A,4])."""
        feats = self.backbone(x, train)
        cls_out = []
        reg_out = []
        for feat, cls_head, reg_head in zip(feats, self.cls_heads,
                                            self.reg_heads):
            cls_out.append(cls_head(feat, train).astype(jnp.float32))
            reg_out.append(reg_head(feat, train).astype(jnp.float32))
        return (jnp.concatenate(cls_out, axis=1),
                jnp.concatenate(reg_out, axis=1))
