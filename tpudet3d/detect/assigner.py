"""MaxIoU anchor↔GT assignment, fully vectorized and jit-safe.

Semantics of the reference's mmdet config (MaxIoUAssigner pos/neg 0.4,
min_pos_iou 0, gt_max_assign_all=False —
/root/reference/configs/detection/mnv2_ssd_300_2_heads.py:42-48):

* anchor is positive to its best-IoU GT when that IoU >= 0.4;
* anchor is negative when its best IoU < 0.4;
* each GT additionally claims its single best anchor (IoU > min_pos_iou).

GT boxes are padded to a static G_max with a validity mask (XLA static
shapes); padded rows never match.
"""

import jax.numpy as jnp

__all__ = ['iou_xyxy', 'assign_anchors']


def iou_xyxy(a, b):
    """Pairwise IoU: a [N,4] x b [M,4] → [N,M]."""
    lt = jnp.maximum(a[:, None, :2], b[None, :, :2])
    rb = jnp.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = jnp.clip(rb - lt, 0)
    inter = wh[..., 0] * wh[..., 1]
    area_a = jnp.clip(a[:, 2] - a[:, 0], 0) * jnp.clip(a[:, 3] - a[:, 1], 0)
    area_b = jnp.clip(b[:, 2] - b[:, 0], 0) * jnp.clip(b[:, 3] - b[:, 1], 0)
    union = area_a[:, None] + area_b[None, :] - inter
    return jnp.where(union > 0, inter / union, 0.0)


def assign_anchors(anchors, gt_boxes, gt_valid, pos_thr=0.4, neg_thr=0.4,
                   min_pos_iou=0.0):
    """Returns (assigned_gt [A] int32 with -1 = background, pos_mask [A]).

    anchors: [A,4]; gt_boxes: [G,4] padded; gt_valid: [G] bool.
    """
    ious = iou_xyxy(anchors, gt_boxes)                       # [A, G]
    ious = jnp.where(gt_valid[None, :], ious, -1.0)
    best_gt = jnp.argmax(ious, axis=1)                       # [A]
    best_iou = jnp.max(ious, axis=1)

    assigned = jnp.where(best_iou >= pos_thr, best_gt, -1)

    # each GT claims its single best anchor (gt_max_assign_all=False)
    ious_t = jnp.where(gt_valid[None, :], ious, -jnp.inf)
    best_anchor = jnp.argmax(ious_t, axis=0)                 # [G]
    gt_best_iou = jnp.max(ious_t, axis=0)
    claim = gt_valid & (gt_best_iou > min_pos_iou)
    gt_ids = jnp.arange(gt_boxes.shape[0])
    # scatter: assigned[best_anchor[g]] = g for claiming gts (later gts win
    # ties, same as a sequential loop); non-claiming gts scatter out of range
    scatter_idx = jnp.where(claim, best_anchor, anchors.shape[0])
    assigned = assigned.at[scatter_idx].set(gt_ids, mode='drop')
    pos_mask = assigned >= 0
    return assigned, pos_mask
