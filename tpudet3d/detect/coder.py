"""DeltaXYWH box coder (reference config: target_stds (0.1,0.1,0.2,0.2),
/root/reference/configs/detection/mnv2_ssd_300_2_heads.py:33-36)."""

import jax.numpy as jnp

__all__ = ['encode_boxes', 'decode_boxes', 'DEFAULT_STDS', 'CASCADE_STDS']

DEFAULT_STDS = (0.1, 0.1, 0.2, 0.2)
# Second-regression stds (cascade head): the refined anchors already sit
# near the GT, so the residuals are small — halved stds give the head a
# finer effective resolution, same rationale as Cascade R-CNN's
# per-stage target_stds tightening.
CASCADE_STDS = (0.05, 0.05, 0.1, 0.1)


def _xyxy_to_cxcywh(boxes):
    wh = boxes[..., 2:4] - boxes[..., 0:2]
    c = boxes[..., 0:2] + wh * 0.5
    return c, wh


def encode_boxes(anchors, gt, stds=DEFAULT_STDS):
    """gt/anchors [...,4] xyxy → normalized deltas [...,4]."""
    stds = jnp.asarray(stds, jnp.float32)
    ac, awh = _xyxy_to_cxcywh(anchors)
    gc, gwh = _xyxy_to_cxcywh(gt)
    awh = jnp.maximum(awh, 1e-6)
    gwh = jnp.maximum(gwh, 1e-6)
    dxy = (gc - ac) / awh
    dwh = jnp.log(gwh / awh)
    return jnp.concatenate([dxy, dwh], axis=-1) / stds


def decode_boxes(anchors, deltas, stds=DEFAULT_STDS, max_wh_ratio=16.0):
    """deltas [...,4] → xyxy boxes; wh clamped like mmdet's wh_ratio_clip."""
    stds = jnp.asarray(stds, jnp.float32)
    deltas = deltas * stds
    ac, awh = _xyxy_to_cxcywh(anchors)
    cxy = ac + deltas[..., 0:2] * awh
    log_clip = jnp.log(max_wh_ratio)
    wh = awh * jnp.exp(jnp.clip(deltas[..., 2:4], -log_clip, log_clip))
    return jnp.concatenate([cxy - wh * 0.5, cxy + wh * 0.5], axis=-1)
