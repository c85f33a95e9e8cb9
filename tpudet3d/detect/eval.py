"""Detector validation: VOC-style mAP over COCO-style data.

The reference validates its detector through mmdet's CocoDataset evaluation
(external; config /root/reference/configs/detection/mnv2_ssd_300_2_heads.py:
128-143).  This is a first-party equivalent: batched jitted forward +
on-device decode, host-side score-ranked matching, AP via precision-envelope
integration (VOC2010/COCO-style all-point interpolation) at a configurable
IoU threshold.
"""

from collections import defaultdict

import numpy as np
import jax
import jax.numpy as jnp

from .anchors import generate_anchors
from .nms import decode_detections

__all__ = ['average_precision', 'DetectorEvaluator']


def average_precision(scores, matched, num_gt):
    """All-point interpolated AP: scores [N], matched [N] bool, num_gt."""
    if num_gt == 0 or len(scores) == 0:
        return 0.0
    order = np.argsort(-np.asarray(scores))
    matched = np.asarray(matched)[order]
    tp = np.cumsum(matched)
    fp = np.cumsum(~matched)
    recall = tp / num_gt
    precision = tp / np.maximum(tp + fp, 1)
    # precision envelope
    for i in range(len(precision) - 2, -1, -1):
        precision[i] = max(precision[i], precision[i + 1])
    # integrate over recall steps
    idx = np.where(np.diff(np.concatenate([[0.0], recall])) > 0)[0]
    return float(np.sum(precision[idx] *
                        np.diff(np.concatenate([[0.0], recall]))[idx]))


class DetectorEvaluator:
    """Accumulates detections + GT; reports per-class AP and mAP."""

    def __init__(self, model, variables, num_classes=9, iou_thr=0.5,
                 score_thr=0.02, max_per_img=100):
        self.num_classes = num_classes
        self.iou_thr = iou_thr
        self.anchors = jnp.asarray(generate_anchors())
        self._records = defaultdict(list)   # cls -> [(score, matched)]
        self._num_gt = np.zeros(num_classes, np.int64)
        mdl = model
        self._variables = variables

        # weights as jit arguments (not closures): lowering a closure over
        # on-device params fetches each leaf separately over the host link
        @jax.jit
        def forward(variables, imgs):
            logits, deltas = mdl.apply(variables, imgs, train=False)
            return jax.vmap(lambda l, d: decode_detections(
                l, d, self.anchors, score_thr=score_thr,
                max_per_img=max_per_img,
                pre_nms_k=2 * max_per_img))(logits, deltas)

        self._forward = forward

    def add_batch(self, imgs, gt_boxes, gt_labels, gt_valid):
        """imgs: normalized [B,S,S,3]; gt in input pixels, padded+mask."""
        dets = np.asarray(self._forward(self._variables,
                                        jnp.asarray(imgs)))
        for b in range(dets.shape[0]):
            boxes = np.asarray(gt_boxes[b])[np.asarray(gt_valid[b])]
            labels = np.asarray(gt_labels[b])[np.asarray(gt_valid[b])]
            for c in np.unique(labels):
                self._num_gt[int(c)] += int(np.sum(labels == c))
            used = np.zeros(len(boxes), bool)
            for x0, y0, x1, y1, score, label in dets[b]:
                if score <= 0:
                    continue
                label = int(label)
                cand = np.nonzero((labels == label) & ~used)[0]
                matched = False
                if len(cand):
                    gb = boxes[cand]
                    ix0 = np.maximum(gb[:, 0], x0)
                    iy0 = np.maximum(gb[:, 1], y0)
                    ix1 = np.minimum(gb[:, 2], x1)
                    iy1 = np.minimum(gb[:, 3], y1)
                    inter = (np.clip(ix1 - ix0, 0, None) *
                             np.clip(iy1 - iy0, 0, None))
                    area_d = max((x1 - x0) * (y1 - y0), 0)
                    area_g = np.clip(gb[:, 2] - gb[:, 0], 0, None) * \
                        np.clip(gb[:, 3] - gb[:, 1], 0, None)
                    ious = inter / np.maximum(area_d + area_g - inter, 1e-9)
                    best = int(np.argmax(ious))
                    if ious[best] >= self.iou_thr:
                        used[cand[best]] = True
                        matched = True
                self._records[label].append((float(score), matched))

    def results(self):
        """{class_id: AP} + 'mAP' over classes with GT."""
        out = {}
        aps = []
        for c in range(self.num_classes):
            recs = self._records.get(c, [])
            scores = [r[0] for r in recs]
            matched = [r[1] for r in recs]
            ap = average_precision(scores, matched, int(self._num_gt[c]))
            out[c] = ap
            if self._num_gt[c] > 0:
                aps.append(ap)
        out['mAP'] = float(np.mean(aps)) if aps else 0.0
        return out
