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
from .anchors import generate_anchors, num_anchors_per_level
from .coder import CASCADE_STDS, decode_boxes, encode_boxes

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
    """``cascade=True`` adds a second regression head per level
    (RefineDet/Cascade-R-CNN style): the first head's decoded boxes act as
    refined anchors for the second head, which regresses the residual at
    finer stds.  At inference the composed box is RE-ENCODED to a plain
    anchor-relative delta, so every existing consumer of
    ``(logits, deltas)`` + ``decode_detections`` gets the refinement with
    no call-site change; at train time the raw per-stage deltas are
    returned for the two-stage loss (losses.ssd_loss cascade path)."""
    num_classes: int = 9
    width_mult: float = 1.0
    dtype: Any = jnp.float32
    cascade: bool = False

    def setup(self):
        self.backbone = MobileNetV2(width_mult=self.width_mult,
                                    out_stages=(4, 6), dtype=self.dtype)
        ks = num_anchors_per_level()
        self.cls_heads = [
            _DepthwiseHead(self.num_classes + 1, k, dtype=self.dtype)
            for k in ks]
        self.reg_heads = [
            _DepthwiseHead(4, k, dtype=self.dtype) for k in ks]
        if self.cascade:
            self.reg2_heads = [
                _DepthwiseHead(4, k, dtype=self.dtype) for k in ks]

    def __call__(self, x, train: bool = False):
        """x [B,S,S,3] → (cls_logits [B,A,C+1], bbox_deltas [B,A,4]).

        With ``cascade`` and ``train=True`` the second element is the
        tuple ``(deltas_stage1, deltas_stage2)`` instead."""
        feats = self.backbone(x, train)
        cls_out = []
        reg_out = []
        reg2_out = []
        for i, feat in enumerate(feats):
            cls_out.append(self.cls_heads[i](feat, train).astype(jnp.float32))
            reg_out.append(self.reg_heads[i](feat, train).astype(jnp.float32))
            if self.cascade:
                reg2_out.append(
                    self.reg2_heads[i](feat, train).astype(jnp.float32))
        logits = jnp.concatenate(cls_out, axis=1)
        d1 = jnp.concatenate(reg_out, axis=1)
        if not self.cascade:
            return logits, d1
        d2 = jnp.concatenate(reg2_out, axis=1)
        if train:
            return logits, (d1, d2)
        # compose: anchors → refined (stage 1) → final (stage 2), then
        # re-encode w.r.t. the original anchors.  encode∘decode is exact
        # (the wh_ratio clip only binds past 16x an anchor side, far
        # outside the clustered-anchor regime), so downstream
        # decode_boxes(anchors, ·) reconstructs the refined box.
        anchors = jnp.asarray(generate_anchors(x.shape[1]))
        refined = decode_boxes(anchors, d1)
        final = decode_boxes(refined, d2, stds=CASCADE_STDS)
        return logits, encode_boxes(anchors, final)
