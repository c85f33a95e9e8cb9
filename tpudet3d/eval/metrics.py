"""Batched device metrics: ADD / SADD / accuracy / 3D IoU, per-class.

Semantics match the reference (torchdet3d/evaluation/metrics.py) but the
implementation is TPU-first:

* ADD/SADD are single fused reductions over [B,9,2] tensors instead of the
  reference's O(81) Python loop over keypoint pairs (metrics.py:10-29).
* Per-class grouping uses one-hot segment sums instead of boolean-mask
  slicing per class (metrics.py:39-68) — static shapes, one kernel.
* The 2D-based 3D IoU (EPnP lift + oriented-box IoU, metrics.py:70-89) runs
  fully on device: batched lift (ops.geometry) + exact polytope clipping
  (ops.box3d) replace the per-sample host EPnP + scipy/qhull round-trip that
  dominates the reference's validation cost (SURVEY.md §3.2).

Note: SADD keeps the reference's definition — for every predicted keypoint
take the min distance over *all* GT keypoints (no bijective matching)
(SURVEY.md §8.8).
"""

from functools import partial

import jax
import jax.numpy as jnp

from ..ops.geometry import lift_2d_batched
from ..ops.box3d import iou_oriented_boxes

__all__ = ['compute_average_distance', 'compute_accuracy',
           'compute_metrics_per_cls', 'compute_2d_based_iou',
           'add_sadd_per_sample']

NUM_KEYPOINTS = 9


def add_sadd_per_sample(pred_kp, gt_kp):
    """Per-sample ADD and SADD sums (not yet normalized): [..., 9, 2] → [...]"""
    diff = pred_kp - gt_kp
    add = jnp.sum(jnp.linalg.norm(diff, axis=-1), axis=-1)           # [...]
    # pairwise [.., pred_i, gt_j]
    pair = jnp.linalg.norm(pred_kp[..., :, None, :] - gt_kp[..., None, :, :], axis=-1)
    sadd = jnp.sum(jnp.min(pair, axis=-1), axis=-1)                  # [...]
    return add, sadd


def compute_average_distance(pred_kp, gt_kp, num_keypoint=NUM_KEYPOINTS,
                             reduce_mean=True, **kwargs):
    """ADD and symmetric-ADD (reference metrics.py:10-29 semantics)."""
    pred_kp = jnp.asarray(pred_kp)
    gt_kp = jnp.asarray(gt_kp)
    add_sum, sadd_sum = add_sadd_per_sample(pred_kp, gt_kp)
    if reduce_mean:
        add = jnp.mean(add_sum) / num_keypoint
        sadd = jnp.mean(sadd_sum) / num_keypoint
    else:
        add = jnp.sum(add_sum) / num_keypoint
        sadd = jnp.sum(sadd_sum) / num_keypoint
    return add, sadd


def compute_accuracy(pred_cats, gt_cats, reduce_mean=True, **kwargs):
    """Classification accuracy from logits (reference metrics.py:31-37)."""
    pred = jnp.argmax(jnp.asarray(pred_cats), axis=1)
    correct = (pred == jnp.asarray(gt_cats)).astype(jnp.float32)
    return jnp.mean(correct) if reduce_mean else jnp.sum(correct)


def compute_2d_based_iou(pred_kp, gt_kp, reduce_mean=True):
    """Lift both 2D keypoint sets with EPnP and compute oriented 3D IoU.

    Fully batched on device (reference metrics.py:70-89 lifts and runs qhull
    per sample on the host).  Lifting uses portrait=True like the reference
    (metrics.py:78)."""
    pred_kp = jnp.asarray(pred_kp)
    gt_kp = jnp.asarray(gt_kp)
    pred_3d = lift_2d_batched(pred_kp, portrait=True)
    gt_3d = lift_2d_batched(gt_kp, portrait=True)
    iou = iou_oriented_boxes(pred_3d, gt_3d)                          # [B]
    return jnp.mean(iou) if reduce_mean else jnp.sum(iou)


@partial(jax.jit, static_argnames=('num_classes', 'compute_iou'))
def _metrics_segments(pred_kp, gt_kp, pred_cats, gt_cats, num_classes,
                      compute_iou, weights=None):
    """One fused kernel: per-class sums + counts for ADD/SADD/IoU/acc.

    ``weights`` [B] (optional) zeroes out padded samples from partial
    batches so static batch shapes don't bias the epoch averages."""
    add_sum, sadd_sum = add_sadd_per_sample(pred_kp, gt_kp)
    add_sum = add_sum / NUM_KEYPOINTS
    sadd_sum = sadd_sum / NUM_KEYPOINTS
    correct = (jnp.argmax(pred_cats, axis=1) == gt_cats).astype(jnp.float32)
    if compute_iou:
        pred_3d = lift_2d_batched(pred_kp, portrait=True)
        gt_3d = lift_2d_batched(gt_kp, portrait=True)
        iou = iou_oriented_boxes(pred_3d, gt_3d)
    else:
        iou = jnp.zeros_like(add_sum)
    if weights is None:
        weights = jnp.ones_like(add_sum)
    seg = lambda x: jax.ops.segment_sum(x * weights, gt_cats,
                                        num_segments=num_classes)
    counts = seg(jnp.ones_like(add_sum))
    return seg(add_sum), seg(sadd_sum), seg(iou), seg(correct), counts


def compute_metrics_per_cls(pred_kp, gt_kp, pred_cats, gt_cats,
                            compute_iou=True, num_classes=NUM_KEYPOINTS, **kwargs):
    """Reference-compatible API (metrics.py:39-68): returns
    ([(cls, ADD, SADD, IOU, acc)...] for classes present in the batch,
    total_ADD, total_SADD, total_IOU, total_acc) as Python floats."""
    pred_kp = jnp.asarray(pred_kp)
    gt_kp = jnp.asarray(gt_kp)
    pred_cats = jnp.asarray(pred_cats)
    gt_cats = jnp.asarray(gt_cats).astype(jnp.int32)
    batch_size = pred_kp.shape[0]

    add_s, sadd_s, iou_s, acc_s, counts = _metrics_segments(
        pred_kp, gt_kp, pred_cats, gt_cats, int(num_classes), bool(compute_iou))
    add_s, sadd_s, iou_s, acc_s, counts = jax.device_get(
        (add_s, sadd_s, iou_s, acc_s, counts))

    computed = []
    for cl in range(int(num_classes)):
        n = counts[cl]
        if n > 0:
            computed.append((cl, float(add_s[cl] / n), float(sadd_s[cl] / n),
                             float(iou_s[cl] / n), float(acc_s[cl] / n)))
    return (computed,
            float(add_s.sum() / batch_size),
            float(sadd_s.sum() / batch_size),
            float(iou_s.sum() / batch_size),
            float(acc_s.sum() / batch_size))
