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
    """Hand-assembled Sequence wire bytes following the PUBLISHED Objectron
    schema field numbers (object.proto: rotation=4, translation=5, scale=6,
    keypoints=7, method=8; a_r_capture_metadata.proto ARCamera: transform=1,
    euler_angles=2, resolution=3/4, intrinsics=5, projection=6, view=7;
    annotation_data.proto FrameAnnotation: plane_center=5, plane_normal=6).
    This encoder is independent of tpudet3d.data.converter.proto — it pins
    the decoder to the documented schema, not to itself."""
    obj = _vi(1, 0) + _s(2, 'cup') + _vi(3, 1)
    for r in (1., 0., 0., 0., 1., 0., 0., 0., 1.):   # rotation = field 4
        obj += _f32(4, r)
    for t in (0.5, -0.5, -2.0):                      # translation = field 5
        obj += _f32(5, t)
    for s in (0.1, 0.2, 0.3):                        # scale = field 6
        obj += _f32(6, s)
    for k in range(2):                               # keypoints = field 7
        obj += _msg(7, _f32(1, k * 1.0) + _f32(2, 0.0) + _f32(3, -1.0))
    obj += _vi(8, 1)                                 # method = ANNOTATION
    frames = b''
    for fid in range(num_frames):
        keypoints = b''
        for k in range(kps_per_obj):
            p2 = _f32(1, 0.1 * k) + _f32(2, 0.05 * k) + _f32(3, 1.0)
            p3 = _f32(1, 1.0) + _f32(2, 2.0) + _f32(3, -3.0)
            keypoints += _msg(2, _vi(1, k) + _msg(2, p3) + _msg(3, p2))
        ann = _vi(1, 0) + keypoints + _f32(3, 1.0)
        cam = b''.join(_f32(1, float(i)) for i in range(16))       # transform
        cam += b''.join(_f32(2, v) for v in (0.1, 0.2, 0.3))   # euler_angles
        cam += _f32(3, 1440.0) + _f32(4, 1920.0)                 # resolution
        cam += b''.join(_f32(5, float(i)) for i in range(9))     # intrinsics
        cam += b''.join(_f32(6, 0.5 * i) for i in range(16))     # projection
        cam += b''.join(_f32(7, 0.25 * i) for i in range(16))    # view
        frame = _vi(1, fid) + _msg(2, ann) + _msg(3, cam) + _f64(4, fid * 0.03)
        frame += b''.join(_f32(5, v) for v in (0., -1., -2.))  # plane_center
        frame += b''.join(_f32(6, v) for v in (0., 1., 0.))    # plane_normal
        frames += _msg(2, frame)
    return _msg(1, obj) + frames


class TestProto:

    def test_sequence_roundtrip(self):
        data = make_sequence()
        seq = parse_sequence(data)
        assert len(seq['objects']) == 1
        obj = seq['objects'][0]
        assert obj['category'] == 'cup'
        np.testing.assert_allclose(obj['rotation'],
                                   [1, 0, 0, 0, 1, 0, 0, 0, 1])
        np.testing.assert_allclose(obj['translation'], [0.5, -0.5, -2.0])
        np.testing.assert_allclose(obj['scale'], [0.1, 0.2, 0.3], atol=1e-7)
        assert len(obj['keypoints']) == 2
        assert abs(obj['keypoints'][1]['x'] - 1.0) < 1e-6
        assert obj['method'] == 1
        assert len(seq['frame_annotations']) == 2
        fr = seq['frame_annotations'][0]
        assert len(fr['annotations'][0]['keypoints']) == 9
        kp0 = fr['annotations'][0]['keypoints'][1]
        assert abs(kp0['point_2d']['x'] - 0.1) < 1e-6
        assert abs(kp0['point_3d']['z'] + 3.0) < 1e-6
        assert abs(fr['timestamp'] - 0.0) < 1e-9
        np.testing.assert_allclose(fr['plane_center'], [0, -1, -2])
        np.testing.assert_allclose(fr['plane_normal'], [0, 1, 0])
        cam = fr['camera']
        assert len(cam['transform']) == 16 and cam['transform'][1] == 1.0
        np.testing.assert_allclose(cam['euler_angles'], [0.1, 0.2, 0.3],
                                   atol=1e-7)
        assert cam['image_resolution_width'] == 1440.0
        assert cam['image_resolution_height'] == 1920.0
        assert len(cam['intrinsics']) == 9
        assert len(cam['projection_matrix']) == 16
        assert len(cam['view_matrix']) == 16
        assert abs(cam['view_matrix'][2] - 0.5) < 1e-6

    def test_unknown_fields_skipped(self):
        data = make_sequence() + _vi(99, 12345) + _s(98, 'junk')
        seq = parse_sequence(data)
        assert len(seq['frame_annotations']) == 2

    def test_decode_google_protobuf_golden(self):
        """Golden .pbdata serialized by google.protobuf 6.33.5 from
        tests/fixtures/objectron_schema_subset.proto (the documented
        Objectron field numbers, compiled with protoc 3.21) — a fully
        independent encoder, packed repeated floats included."""
        import os.path as osp
        path = osp.join(osp.dirname(__file__), 'fixtures',
                        'sequence_protobuf633.pbdata')
        seq = parse_sequence(open(path, 'rb').read())
        obj = seq['objects'][0]
        assert obj['id'] == 3 and obj['category'] == 'laptop'
        assert obj['type'] == 1 and obj['method'] == 1
        np.testing.assert_allclose(obj['rotation'],
                                   [1, 0, 0, 0, 0, -1, 0, 1, 0])
        np.testing.assert_allclose(obj['translation'], [0.5, -0.25, -1.5])
        np.testing.assert_allclose(obj['scale'], [0.3, 0.02, 0.2], atol=1e-7)
        assert abs(obj['keypoints'][0]['z'] - 0.3) < 1e-6
        fr = seq['frame_annotations'][0]
        assert fr['frame_id'] == 7
        ann = fr['annotations'][0]
        assert ann['object_id'] == 3
        assert abs(ann['visibility'] - 0.87) < 1e-6
        assert len(ann['keypoints']) == 9
        assert abs(ann['keypoints'][3]['point_2d']['x'] - 0.3) < 1e-6
        assert abs(ann['keypoints'][3]['point_3d']['z'] + 3.0) < 1e-6
        cam = fr['camera']
        assert len(cam['transform']) == 16
        assert cam['image_resolution_width'] == 1440.0
        assert len(cam['intrinsics']) == 9
        assert abs(fr['timestamp'] - 0.21) < 1e-9
        np.testing.assert_allclose(fr['plane_center'], [0, -1, -2])
        np.testing.assert_allclose(fr['plane_normal'], [0, 1, 0])

    def test_packed_repeated_floats(self):
        """proto3 serializers emit repeated floats PACKED (one
        length-delimited blob) — the layout real .pbdata files use."""
        packed_rot = struct.pack('<9f', *[1, 0, 0, 0, 1, 0, 0, 0, 1])
        packed_scale = struct.pack('<3f', 0.1, 0.2, 0.3)
        obj = (_s(2, 'shoe') +
               _tag(4, 2) + _varint(len(packed_rot)) + packed_rot +
               _tag(6, 2) + _varint(len(packed_scale)) + packed_scale)
        seq = parse_sequence(_msg(1, obj))
        np.testing.assert_allclose(seq['objects'][0]['rotation'],
                                   [1, 0, 0, 0, 1, 0, 0, 0, 1])
        np.testing.assert_allclose(seq['objects'][0]['scale'],
                                   [0.1, 0.2, 0.3], atol=1e-7)


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
