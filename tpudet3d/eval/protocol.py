"""Objectron official evaluation protocol (vendor-equivalent).

The reference subclasses ``objectron.dataset.eval.Evaluator`` and its
HitMiss/AveragePrecision accumulators over TFRecord shards
(/root/reference/scripts/objectron_eval.py).  The vendor package is not
vendored here, so this module re-implements the protocol surface:

* ``HitMiss`` / ``AveragePrecision`` accumulators;
* per-example matching of predictions to GT instances by 2D-keypoint IoU;
* metrics: 3D IoU (our exact device kernel), 2D pixel error, azimuth and
  polar rotation errors, ADD / ADD-S with ground-plane scale recovery
  (scale = mean over the 4 lowest vertex·n of center·n / vertex·n);
* a pure-python TFRecord reader + tf.train.Example wire parser (no TF dep).

Report format mirrors the reference's per-class text report
(objectron_eval.py:177-237).
"""

import struct

import numpy as np
import jax.numpy as jnp

from ..ops.box3d import iou_oriented_boxes, box_axes
from ..data.converter.proto import decode_message

__all__ = ['HitMiss', 'AveragePrecision', 'ObjectronProtocolEvaluator',
           'read_tfrecord', 'parse_example', 'compute_scale',
           'rotation_errors', 'MAX_PIXEL_ERROR', 'MAX_AZIMUTH_ERROR',
           'MAX_POLAR_ERROR', 'MAX_DISTANCE', 'NUM_BINS']

# protocol constants (vendor objectron.dataset.metrics defaults)
MAX_PIXEL_ERROR = 20.0
MAX_AZIMUTH_ERROR = 30.0
MAX_POLAR_ERROR = 20.0
MAX_DISTANCE = 1.0
NUM_BINS = 21


class HitMiss:
    """Hit/miss counts across a threshold sweep."""

    def __init__(self, thresholds, greater_is_hit=True):
        self.thresholds = np.asarray(thresholds, np.float64)
        self.greater = greater_is_hit
        self.hit = np.zeros(len(self.thresholds))
        self.miss = np.zeros(len(self.thresholds))

    def record_hit_miss(self, metric):
        if self.greater:
            hits = metric >= self.thresholds
        else:
            hits = metric <= self.thresholds
        self.hit += hits
        self.miss += ~hits


class AveragePrecision:
    """Accumulates HitMiss curves; AP = mean precision over the sweep."""

    def __init__(self, num_bins=NUM_BINS):
        self.aps = np.zeros(num_bins)
        self.true_positive = np.zeros(num_bins)
        self.false_positive = np.zeros(num_bins)
        self._total_instances = 0

    def append(self, hit_miss, num_instances):
        self.true_positive += hit_miss.hit
        self.false_positive += hit_miss.miss
        self._total_instances += num_instances

    def compute_ap_curve(self):
        total = self.true_positive + self.false_positive
        with np.errstate(invalid='ignore', divide='ignore'):
            self.aps = np.where(total > 0, self.true_positive / total, 0.0)
        return self.aps


def fit_box(vertices9):
    """9 keypoints → (rotation [3,3], translation [3], scale [3])."""
    center, axes = box_axes(jnp.asarray(vertices9))
    axes = np.asarray(axes)
    center = np.asarray(center)
    norms = np.linalg.norm(axes, axis=-1)
    rot = axes / np.maximum(norms[:, None], 1e-12)
    return rot.T, center, 2.0 * norms   # columns = box axes


def compute_scale(box_vertices9, plane):
    """Ground-plane scale recovery (vendor Evaluator.compute_scale):
    scale = mean over the 4 plane-nearest vertices of
    (plane_center·n) / (vertex·n)."""
    center, normal = plane
    verts = np.asarray(box_vertices9)[1:]
    dots = np.sort(verts @ np.asarray(normal))
    center_dot = float(np.dot(center, normal))
    denom = dots[:4]
    denom = np.where(np.abs(denom) < 1e-12, 1e-12, denom)
    return float(np.mean(center_dot / denom))


def rotation_errors(rot_gt, rot_pred, up_axis=1, symmetric_mod=180.0):
    """(azimuth_err_deg, polar_err_deg) between two box rotations.

    Azimuth: rotation about the box up axis, folded by the box's 180°
    symmetry; polar: angle between the up axes."""
    up_gt = rot_gt[:, up_axis]
    up_pred = rot_pred[:, up_axis]
    cos_polar = np.clip(abs(float(up_gt @ up_pred)), -1.0, 1.0)
    polar = np.degrees(np.arccos(cos_polar))

    fwd_axis = 0 if up_axis != 0 else 2
    f_gt = rot_gt[:, fwd_axis]
    f_pred = rot_pred[:, fwd_axis]
    # project both forward axes into the GT horizontal plane
    f_gt_h = f_gt - (f_gt @ up_gt) * up_gt
    f_pred_h = f_pred - (f_pred @ up_gt) * up_gt
    n1 = np.linalg.norm(f_gt_h)
    n2 = np.linalg.norm(f_pred_h)
    if n1 < 1e-9 or n2 < 1e-9:
        azimuth = 0.0
    else:
        cos_az = np.clip(float(f_gt_h @ f_pred_h) / (n1 * n2), -1.0, 1.0)
        azimuth = np.degrees(np.arccos(cos_az))
        azimuth = azimuth % symmetric_mod
        azimuth = min(azimuth, symmetric_mod - azimuth)
    return azimuth, polar


def _kp_iou_2d(kp_a, kp_b):
    """Axis-aligned IoU of the 2D extents of two keypoint sets."""
    a0, a1 = kp_a.min(0), kp_a.max(0)
    b0, b1 = kp_b.min(0), kp_b.max(0)
    lt = np.maximum(a0, b0)
    rb = np.minimum(a1, b1)
    inter = np.prod(np.clip(rb - lt, 0, None))
    union = (np.prod(a1 - a0) + np.prod(b1 - b0) - inter)
    return inter / union if union > 0 else 0.0


class ObjectronProtocolEvaluator:
    """Accumulates the official metric suite for one category."""

    def __init__(self, height=640, width=480):
        self.height = height
        self.width = width
        self._ap_iou = AveragePrecision()
        self._ap_pixel = AveragePrecision()
        self._ap_azimuth = AveragePrecision()
        self._ap_polar = AveragePrecision()
        self._ap_add = AveragePrecision()
        self._ap_adds = AveragePrecision()
        self._iou_thresholds = np.linspace(0.0, 1.0, NUM_BINS)
        self._pixel_thresholds = np.linspace(0.0, MAX_PIXEL_ERROR, NUM_BINS)
        self._azimuth_thresholds = np.linspace(0.0, MAX_AZIMUTH_ERROR, NUM_BINS)
        self._polar_thresholds = np.linspace(0.0, MAX_POLAR_ERROR, NUM_BINS)
        self._add_thresholds = np.linspace(0.0, MAX_DISTANCE, NUM_BINS)
        self._matched = 0
        self._total_gt = 0
        self._sum_iou = 0.0
        self._sum_pixel = 0.0

    def evaluate_example(self, pred_kp_sets_2d, pred_kp_sets_3d,
                         gt_kp_sets_2d, gt_kp_sets_3d, plane=None,
                         match_iou=0.5):
        """pred/gt: lists of ([9,2] normalized 2D, [9,3] 3D) keypoint sets.

        Matches each GT to the best prediction by 2D-extent IoU and records
        every metric accumulator (one HitMiss per GT instance, missing
        predictions count as misses everywhere, like the vendor loop)."""
        self._total_gt += len(gt_kp_sets_2d)
        used = set()
        for gt2d, gt3d in zip(gt_kp_sets_2d, gt_kp_sets_3d):
            hm_iou = HitMiss(self._iou_thresholds, True)
            hm_pixel = HitMiss(self._pixel_thresholds, False)
            hm_az = HitMiss(self._azimuth_thresholds, False)
            hm_pol = HitMiss(self._polar_thresholds, False)
            hm_add = HitMiss(self._add_thresholds, False)
            hm_adds = HitMiss(self._add_thresholds, False)

            best, best_iou2d = None, match_iou
            for i, p2d in enumerate(pred_kp_sets_2d):
                if i in used:
                    continue
                v = _kp_iou_2d(np.asarray(p2d), np.asarray(gt2d))
                if v >= best_iou2d:
                    best, best_iou2d = i, v
            if best is not None:
                used.add(best)
                p2d = np.asarray(pred_kp_sets_2d[best])
                p3d = np.asarray(pred_kp_sets_3d[best], np.float64)
                g3d = np.asarray(gt3d, np.float64)
                if plane is not None:
                    scale = compute_scale(p3d, plane)
                    p3d = p3d * scale
                iou = float(iou_oriented_boxes(jnp.asarray(p3d),
                                               jnp.asarray(g3d)))
                pixel = float(np.mean(np.linalg.norm(
                    (p2d - np.asarray(gt2d)) *
                    np.asarray([self.width, self.height]), axis=-1)))
                rot_p, _, _ = fit_box(p3d)
                rot_g, _, _ = fit_box(g3d)
                azimuth, polar = rotation_errors(rot_g, rot_p)
                add = float(np.mean(np.linalg.norm(p3d - g3d, axis=-1)))
                pair = np.linalg.norm(p3d[:, None] - g3d[None, :], axis=-1)
                adds = float(np.mean(pair.min(axis=1)))
                hm_iou.record_hit_miss(iou)
                hm_pixel.record_hit_miss(pixel)
                hm_az.record_hit_miss(azimuth)
                hm_pol.record_hit_miss(polar)
                hm_add.record_hit_miss(add)
                hm_adds.record_hit_miss(adds)
                self._matched += 1
                self._sum_iou += iou
                self._sum_pixel += pixel
            self._ap_iou.append(hm_iou, 1)
            self._ap_pixel.append(hm_pixel, 1)
            self._ap_azimuth.append(hm_az, 1)
            self._ap_polar.append(hm_pol, 1)
            self._ap_add.append(hm_add, 1)
            self._ap_adds.append(hm_adds, 1)

    def finalize(self):
        for ap in (self._ap_iou, self._ap_pixel, self._ap_azimuth,
                   self._ap_polar, self._ap_add, self._ap_adds):
            ap.compute_ap_curve()

    def write_report(self, category, stream=None):
        import sys
        stream = stream or sys.stdout

        def fmt(name, thresholds, ap):
            stream.write(f'   {name}: ')
            stream.write(', '.join(f'{t:.2f}:{v:.3f}' for t, v in
                                   zip(thresholds, ap.aps)))
            stream.write('\n')

        stream.write(f'Report for category {category}\n')
        n = max(self._matched, 1)
        stream.write(f'  matched {self._matched}/{self._total_gt} instances\n')
        stream.write(f'  Mean 3D IoU: {self._sum_iou / n:.4f}\n')
        stream.write(f'  Mean 2D pixel error: {self._sum_pixel / n:.4f}\n')
        fmt('AP @ 3D IoU', self._iou_thresholds, self._ap_iou)
        fmt('AP @ 2D pixel', self._pixel_thresholds, self._ap_pixel)
        fmt('AP @ azimuth', self._azimuth_thresholds, self._ap_azimuth)
        fmt('AP @ polar', self._polar_thresholds, self._ap_polar)
        fmt('AP @ ADD', self._add_thresholds, self._ap_add)
        fmt('AP @ ADDS', self._add_thresholds, self._ap_adds)


# --- TFRecord + tf.train.Example parsing (no TensorFlow) -------------------

def read_tfrecord(path):
    """Yield raw record payloads from a TFRecord file (CRCs skipped)."""
    with open(path, 'rb') as f:
        while True:
            header = f.read(12)
            if len(header) < 12:
                return
            (length,) = struct.unpack('<Q', header[:8])
            payload = f.read(length)
            f.read(4)  # data crc
            if len(payload) < length:
                return
            yield payload


_FEATURE_SCHEMA = {
    1: ('bytes[]', 'string_bytes', None),
    2: ('floats', 'message', {1: ('value[]', 'float', None)}),
    3: ('ints', 'message', {1: ('value[]', 'varint', None)}),
}


def _decode_feature(buf):
    out = {}
    pos = 0
    n = len(buf)
    while pos < n:
        from ..data.converter.proto import _read_varint, _skip
        tag, pos = _read_varint(buf, pos)
        field, wire = tag >> 3, tag & 7
        if field == 1 and wire == 2:    # BytesList
            ln, pos = _read_varint(buf, pos)
            sub = buf[pos:pos + ln]
            pos += ln
            spos = 0
            vals = []
            while spos < len(sub):
                stag, spos = _read_varint(sub, spos)
                sln, spos = _read_varint(sub, spos)
                vals.append(sub[spos:spos + sln])
                spos += sln
            out['bytes'] = vals
        elif field == 2 and wire == 2:  # FloatList
            ln, pos = _read_varint(buf, pos)
            sub = buf[pos:pos + ln]
            pos += ln
            vals = decode_message(sub, {1: ('value[]', 'float', None)})
            out['floats'] = vals.get('value', [])
        elif field == 3 and wire == 2:  # Int64List
            ln, pos = _read_varint(buf, pos)
            sub = buf[pos:pos + ln]
            pos += ln
            vals = decode_message(sub, {1: ('value[]', 'varint', None)})
            out['ints'] = vals.get('value', [])
        else:
            pos = _skip(buf, pos, wire)
    return out


def parse_example(payload):
    """tf.train.Example bytes → {feature_name: {'bytes'|'floats'|'ints'}}."""
    from ..data.converter.proto import _read_varint, _skip
    features = {}

    def walk_features(buf):
        pos = 0
        while pos < len(buf):
            tag, pos = _read_varint(buf, pos)
            field, wire = tag >> 3, tag & 7
            if field == 1 and wire == 2:   # map entry
                ln, pos = _read_varint(buf, pos)
                entry = buf[pos:pos + ln]
                pos += ln
                epos = 0
                key, val = None, None
                while epos < len(entry):
                    etag, epos = _read_varint(entry, epos)
                    ef, ew = etag >> 3, etag & 7
                    if ef == 1 and ew == 2:
                        ln2, epos = _read_varint(entry, epos)
                        key = entry[epos:epos + ln2].decode()
                        epos += ln2
                    elif ef == 2 and ew == 2:
                        ln2, epos = _read_varint(entry, epos)
                        val = _decode_feature(entry[epos:epos + ln2])
                        epos += ln2
                    else:
                        epos = _skip(entry, epos, ew)
                if key is not None:
                    features[key] = val or {}
            else:
                pos = _skip(buf, pos, wire)

    pos = 0
    while pos < len(payload):
        tag, pos = _read_varint(payload, pos)
        field, wire = tag >> 3, tag & 7
        if field == 1 and wire == 2:       # Features
            ln, pos = _read_varint(payload, pos)
            walk_features(payload[pos:pos + ln])
            pos += ln
        else:
            pos = _skip(payload, pos, wire)
    return features
