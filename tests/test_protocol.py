"""Objectron-protocol evaluator tests: accumulators, scale recovery,
rotation errors, TFRecord + tf.train.Example round-trip."""

import struct

import numpy as np

from tpudet3d.eval.protocol import (HitMiss, AveragePrecision,
                                    ObjectronProtocolEvaluator, compute_scale,
                                    rotation_errors, read_tfrecord,
                                    parse_example, fit_box, NUM_BINS)
from tests.test_box3d import box_kps


class TestAccumulators:

    def test_hitmiss_greater(self):
        hm = HitMiss(np.asarray([0.25, 0.5, 0.75]), greater_is_hit=True)
        hm.record_hit_miss(0.6)
        assert hm.hit.tolist() == [1, 1, 0]
        assert hm.miss.tolist() == [0, 0, 1]

    def test_ap_curve(self):
        ap = AveragePrecision(num_bins=3)
        hm = HitMiss(np.asarray([0.1, 0.5, 0.9]))
        hm.record_hit_miss(0.6)
        ap.append(hm, 1)
        curve = ap.compute_ap_curve()
        assert curve.tolist() == [1.0, 1.0, 0.0]


class TestGeometryBits:

    def test_fit_box_identity(self):
        kps = box_kps(np.asarray([1., 2., 3.]), np.asarray([.5, .4, .3]))
        rot, center, scale = fit_box(kps)
        assert np.allclose(center, [1, 2, 3], atol=1e-6)
        assert np.allclose(sorted(scale), sorted([1.0, 0.8, 0.6]), atol=1e-6)
        assert np.allclose(np.abs(np.linalg.det(rot)), 1.0, atol=1e-5)

    def test_compute_scale_recovers_true_scale(self):
        # camera above ground: plane y = -1; GT box rests on it
        gt = box_kps(np.asarray([0., -0.5, -2.]), np.asarray([.5, .5, .5]))
        plane = (np.asarray([0., -1., -2.]), np.asarray([0., 1., 0.]))
        # prediction = same box shrunk by 2x (EPnP scale ambiguity)
        pred = gt * 0.5
        s = compute_scale(pred, plane)
        assert abs(s - 2.0) < 1e-6

    def test_rotation_errors_zero_for_identical(self):
        kps = box_kps(np.zeros(3), np.asarray([.5, .4, .3]))
        rot, _, _ = fit_box(kps)
        az, pol = rotation_errors(rot, rot)
        assert az < 1e-4 and pol < 1e-4

    def test_rotation_errors_azimuth(self):
        th = np.radians(30)
        rot_y = np.array([[np.cos(th), 0, np.sin(th)],
                          [0, 1, 0],
                          [-np.sin(th), 0, np.cos(th)]])
        eye = np.eye(3)
        az, pol = rotation_errors(eye, rot_y @ eye)
        assert abs(az - 30) < 1e-3 and pol < 1e-4


class TestEvaluatorFlow:

    def test_perfect_predictions_max_ap(self):
        ev = ObjectronProtocolEvaluator()
        gt3d = box_kps(np.asarray([0., 0., -2.]), np.asarray([.3, .3, .3]))
        gt2d = np.random.RandomState(0).rand(9, 2)
        ev.evaluate_example([gt2d], [gt3d], [gt2d], [gt3d])
        ev.finalize()
        assert ev._ap_iou.aps[1:].min() > 0.99       # iou=1 hits all but t=...
        assert ev._ap_pixel.aps.max() == 1.0

    def test_missing_prediction_counts_miss(self):
        ev = ObjectronProtocolEvaluator()
        gt3d = box_kps(np.zeros(3), np.asarray([.3, .3, .3]))
        gt2d = np.random.RandomState(0).rand(9, 2)
        ev.evaluate_example([], [], [gt2d], [gt3d])
        ev.finalize()
        assert ev._ap_iou.aps.max() == 0.0


def _varint(v):
    out = b''
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out += bytes([b | 0x80])
        else:
            return out + bytes([b])


def _feature_bytes(vals):
    inner = b''
    for v in vals:
        inner += _varint(1 << 3 | 2) + _varint(len(v)) + v
    return _varint(1 << 3 | 2) + _varint(len(inner)) + inner


def _feature_floats(vals):
    packed = struct.pack(f'<{len(vals)}f', *vals)
    inner = _varint(1 << 3 | 2) + _varint(len(packed)) + packed
    return _varint(2 << 3 | 2) + _varint(len(inner)) + inner


def _feature_ints(vals):
    inner = b''
    for v in vals:
        inner += _varint(1 << 3 | 0) + _varint(v)
    return _varint(3 << 3 | 2) + _varint(len(inner)) + inner


def make_example(features):
    body = b''
    for key, feat in features.items():
        kb = key.encode()
        entry = _varint(1 << 3 | 2) + _varint(len(kb)) + kb
        entry += _varint(2 << 3 | 2) + _varint(len(feat)) + feat
        body += _varint(1 << 3 | 2) + _varint(len(entry)) + entry
    return _varint(1 << 3 | 2) + _varint(len(body)) + body


class TestTFRecordExample:

    def test_roundtrip(self, tmp_path):
        example = make_example({
            'image/encoded': _feature_bytes([b'JPEGDATA']),
            'point_2d': _feature_floats([0.1, 0.2, 1.0] * 9),
            'instance_num': _feature_ints([1]),
        })
        path = tmp_path / 'shard.tfrecord'
        with open(path, 'wb') as f:
            f.write(struct.pack('<Q', len(example)))
            f.write(b'\x00' * 4)
            f.write(example)
            f.write(b'\x00' * 4)
        records = list(read_tfrecord(str(path)))
        assert len(records) == 1
        feats = parse_example(records[0])
        assert feats['image/encoded']['bytes'][0] == b'JPEGDATA'
        assert len(feats['point_2d']['floats']) == 27
        assert feats['instance_num']['ints'] == [1]
