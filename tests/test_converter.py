"""Converter tests: wire-format round-trip + bbox derivation rules."""

import struct

import numpy as np

from tpudet3d.data.converter.proto import parse_sequence, decode_message
from tpudet3d.data.converter.objectron_to_coco import (keypoints_to_bbox,
                                                       unnormalize_keypoints)


# --- tiny wire-format encoder (test-only) ---------------------------------

def _varint(v):
    out = b''
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out += bytes([b | 0x80])
        else:
            return out + bytes([b])


def _tag(field, wire):
    return _varint(field << 3 | wire)


def _f32(field, val):
    return _tag(field, 5) + struct.pack('<f', val)


def _f64(field, val):
    return _tag(field, 1) + struct.pack('<d', val)


def _msg(field, payload):
    return _tag(field, 2) + _varint(len(payload)) + payload


def _s(field, text):
    raw = text.encode()
    return _tag(field, 2) + _varint(len(raw)) + raw


def _vi(field, v):
    return _tag(field, 0) + _varint(v)


def make_sequence(num_frames=2, kps_per_obj=9):
    obj = _vi(1, 0) + _s(2, 'cup') + _vi(3, 1)
    for s in (0.1, 0.2, 0.3):
        obj += _f32(7, s)
    frames = b''
    for fid in range(num_frames):
        keypoints = b''
        for k in range(kps_per_obj):
            p2 = _f32(1, 0.1 * k) + _f32(2, 0.05 * k) + _f32(3, 1.0)
            p3 = _f32(1, 1.0) + _f32(2, 2.0) + _f32(3, -3.0)
            keypoints += _msg(2, _vi(1, k) + _msg(2, p3) + _msg(3, p2))
        ann = _vi(1, 0) + keypoints + _f32(3, 1.0)
        cam = b''.join(_f32(1, float(i)) for i in range(16))
        frame = _vi(1, fid) + _msg(2, ann) + _msg(3, cam) + _f64(4, fid * 0.03)
        frames += _msg(2, frame)
    return _msg(1, obj) + frames


class TestProto:

    def test_sequence_roundtrip(self):
        data = make_sequence()
        seq = parse_sequence(data)
        assert len(seq['objects']) == 1
        assert seq['objects'][0]['category'] == 'cup'
        assert seq['objects'][0]['scale'] == [
            np.float32(0.1), np.float32(0.2), np.float32(0.3)]
        assert len(seq['frame_annotations']) == 2
        fr = seq['frame_annotations'][0]
        assert len(fr['annotations'][0]['keypoints']) == 9
        kp0 = fr['annotations'][0]['keypoints'][1]
        assert abs(kp0['point_2d']['x'] - 0.1) < 1e-6
        assert abs(kp0['point_3d']['z'] + 3.0) < 1e-6
        assert abs(fr['timestamp'] - 0.0) < 1e-9

    def test_unknown_fields_skipped(self):
        data = make_sequence() + _vi(99, 12345) + _s(98, 'junk')
        seq = parse_sequence(data)
        assert len(seq['frame_annotations']) == 2


class TestBBox:

    def test_in_frame_box(self):
        kp = np.asarray([[10, 10], [50, 80]] + [[20, 20]] * 7)
        box = keypoints_to_bbox(kp, (100, 100))
        assert box == [10, 10, 40, 70]

    def test_out_of_frame_dropped_unless_clipped(self):
        kp = np.asarray([[-5, 10], [50, 80]] + [[20, 20]] * 7)
        assert keypoints_to_bbox(kp, (100, 100), clip=False) is None
        assert keypoints_to_bbox(kp, (100, 100), clip=True) == [0, 10, 50, 70]

    def test_unnormalize_split(self):
        flat = np.tile(np.asarray([[0.5, 0.5, 1.0]]), (18, 1))
        objs = unnormalize_keypoints(flat, [9, 9], (200, 100))
        assert len(objs) == 2 and objs[0].shape == (9, 2)
        assert objs[0][0].tolist() == [100, 50]
