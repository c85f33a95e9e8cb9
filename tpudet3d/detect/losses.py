"""SSD training loss: MaxIoU assignment + hard negative mining + SmoothL1,
with learned loss balancing — all inside one jitted graph.

Reference semantics (/root/reference/configs/detection/
mnv2_ssd_300_2_heads.py:40-54): assigner pos/neg 0.4, neg:pos ratio 3,
smoothl1_beta 1.0, ``loss_balancing=True`` (uncertainty weighting of the two
loss terms).  Hard-negative selection is a fixed-K ``top_k`` over masked
per-anchor CE losses instead of mmdet's per-image dynamic sort.
"""

import jax
import jax.numpy as jnp

from .assigner import assign_anchors
from .coder import CASCADE_STDS, decode_boxes, encode_boxes

__all__ = ['ssd_loss', 'giou_xyxy_paired']


def _per_anchor_ce(logits, labels):
    lse = jax.nn.logsumexp(logits, axis=-1)
    picked = jnp.take_along_axis(logits, labels[..., None], axis=-1)[..., 0]
    return lse - picked


def giou_xyxy_paired(a, b):
    """Elementwise GIoU (Rezatofighi et al. 2019) for paired boxes
    a, b [...,4] xyxy → [...]. Scale-invariant, in [-1, 1]."""
    lt = jnp.maximum(a[..., :2], b[..., :2])
    rb = jnp.minimum(a[..., 2:], b[..., 2:])
    wh = jnp.clip(rb - lt, 0)
    inter = wh[..., 0] * wh[..., 1]
    area_a = (jnp.clip(a[..., 2] - a[..., 0], 0) *
              jnp.clip(a[..., 3] - a[..., 1], 0))
    area_b = (jnp.clip(b[..., 2] - b[..., 0], 0) *
              jnp.clip(b[..., 3] - b[..., 1], 0))
    union = area_a + area_b - inter
    iou = inter / jnp.maximum(union, 1e-9)
    elt = jnp.minimum(a[..., :2], b[..., :2])
    erb = jnp.maximum(a[..., 2:], b[..., 2:])
    ewh = jnp.clip(erb - elt, 0)
    earea = ewh[..., 0] * ewh[..., 1]
    return iou - (earea - union) / jnp.maximum(earea, 1e-9)


def ssd_loss(cls_logits, bbox_deltas, anchors, gt_boxes, gt_labels, gt_valid,
             balance_params=None, neg_pos_ratio=3, smoothl1_beta=1.0,
             pos_thr=0.4, neg_thr=0.4, uniform_neg_weight=0.1,
             cascade_deltas=None, cascade_pos_thr=0.5, giou_weight=0.0):
    """Batched SSD loss.

    cls_logits [B,A,C+1]; bbox_deltas [B,A,4]; anchors [A,4];
    gt_boxes [B,G,4] (padded), gt_labels [B,G] int32, gt_valid [B,G] bool.
    balance_params: optional (s_cls, s_reg) log-variance scalars.
    cascade_deltas: optional stage-2 deltas [B,A,4] (SSDDetector cascade);
    targets for them are re-assigned against the stage-1 DECODED boxes at
    the tighter ``cascade_pos_thr`` and encoded at CASCADE_STDS.
    giou_weight: adds ``w * (1 - GIoU(decoded, gt))`` over positives to
    each stage's regression loss — SmoothL1 on deltas optimizes the
    coder's metric, GIoU optimizes the box overlap the chain actually
    consumes (crop framing for stage 2).
    Returns (total_loss, dict of scalars).

    ``uniform_neg_weight`` adds a small CE term over ALL negatives on top of
    the mined hard negatives: pure top-k mining leaves the unmined anchors
    with no gradient, and their logits drift to confident garbage that the
    per-step top-k can't suppress fast enough (verified empirically: the
    synthetic overfit test reaches 18/18 recall with the term and 0/18
    without).  mmdet's runs hide this behind very long schedules.
    """
    num_classes = cls_logits.shape[-1] - 1
    background = num_classes

    def per_image(logits, deltas, deltas2, boxes, labels, valid):
        assigned, pos = assign_anchors(anchors, boxes, valid,
                                       pos_thr=pos_thr, neg_thr=neg_thr)
        safe_gt = jnp.maximum(assigned, 0)
        target_labels = jnp.where(pos, labels[safe_gt], background)
        ce = _per_anchor_ce(logits, target_labels)               # [A]

        n_pos = jnp.sum(pos)
        # hard negative mining: top (3*n_pos) negative CE losses
        neg_ce = jnp.where(pos, -jnp.inf, ce)
        k = anchors.shape[0]
        sorted_neg = jnp.sort(neg_ce)[::-1]                      # desc
        n_neg = jnp.minimum(neg_pos_ratio * n_pos, k - n_pos)
        idx = jnp.arange(k)
        neg_sum = jnp.sum(jnp.where(idx < n_neg,
                                    jnp.where(jnp.isfinite(sorted_neg),
                                              sorted_neg, 0.0), 0.0))
        pos_sum = jnp.sum(jnp.where(pos, ce, 0.0))
        denom = jnp.maximum(n_pos, 1).astype(jnp.float32)
        cls_loss = (pos_sum + neg_sum) / denom
        if uniform_neg_weight:
            neg_mask = jnp.logical_not(pos)
            all_neg_mean = (jnp.sum(jnp.where(neg_mask, ce, 0.0)) /
                            jnp.maximum(jnp.sum(neg_mask), 1))
            cls_loss = cls_loss + uniform_neg_weight * all_neg_mean

        target_deltas = encode_boxes(anchors, boxes[safe_gt])
        diff = jnp.abs(deltas - target_deltas)
        sl1 = jnp.where(diff < smoothl1_beta,
                        0.5 * diff * diff / smoothl1_beta,
                        diff - 0.5 * smoothl1_beta)
        reg_loss = jnp.sum(jnp.where(pos[:, None], sl1, 0.0)) / denom
        if giou_weight:
            dec1 = decode_boxes(anchors, deltas)
            g1 = 1.0 - giou_xyxy_paired(dec1, boxes[safe_gt])
            reg_loss = reg_loss + giou_weight * jnp.sum(
                jnp.where(pos, g1, 0.0)) / denom

        if cascade_deltas is not None:
            # stage 2 regresses the residual from the stage-1 DECODED box;
            # stop_gradient keeps the stages' objectives independent
            # (Cascade R-CNN trains each stage on the previous stage's
            # outputs, not through them)
            refined = decode_boxes(anchors, jax.lax.stop_gradient(deltas))
            assigned2, pos2 = assign_anchors(refined, boxes, valid,
                                             pos_thr=cascade_pos_thr,
                                             neg_thr=cascade_pos_thr)
            safe2 = jnp.maximum(assigned2, 0)
            t2 = encode_boxes(refined, boxes[safe2], stds=CASCADE_STDS)
            diff2 = jnp.abs(deltas2 - t2)
            sl2 = jnp.where(diff2 < smoothl1_beta,
                            0.5 * diff2 * diff2 / smoothl1_beta,
                            diff2 - 0.5 * smoothl1_beta)
            denom2 = jnp.maximum(jnp.sum(pos2), 1).astype(jnp.float32)
            reg2 = jnp.sum(jnp.where(pos2[:, None], sl2, 0.0)) / denom2
            if giou_weight:
                dec2 = decode_boxes(refined, deltas2, stds=CASCADE_STDS)
                g2 = 1.0 - giou_xyxy_paired(dec2, boxes[safe2])
                reg2 = reg2 + giou_weight * jnp.sum(
                    jnp.where(pos2, g2, 0.0)) / denom2
            reg_loss = reg_loss + reg2
        return cls_loss, reg_loss, n_pos

    # deltas2 is a dummy copy of deltas when cascade is off (the branch
    # above is Python-static, so the dummy is never read)
    cls_l, reg_l, n_pos = jax.vmap(per_image)(
        cls_logits, bbox_deltas,
        cascade_deltas if cascade_deltas is not None else bbox_deltas,
        gt_boxes, gt_labels, gt_valid)
    cls_loss = jnp.mean(cls_l)
    reg_loss = jnp.mean(reg_l)

    if balance_params is not None:
        # clamped uncertainty weighting: unbounded s lets the optimizer
        # crush whichever term has the higher loss (cls, early in training)
        # and detection never recovers — observed on the synthetic task
        # (recall 0 with free s, 0.9 with plain sum)
        s_cls = jnp.clip(balance_params[0], -1.0, 1.0)
        s_reg = jnp.clip(balance_params[1], -1.0, 1.0)
        total = (jnp.exp(-s_cls) * cls_loss + 0.5 * s_cls +
                 jnp.exp(-s_reg) * reg_loss + 0.5 * s_reg)
    else:
        total = cls_loss + reg_loss
    return total, {'cls_loss': cls_loss, 'reg_loss': reg_loss,
                   'num_pos': jnp.mean(n_pos.astype(jnp.float32))}
