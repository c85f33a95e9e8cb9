"""objectron_eval CLI pieces: TFRecord example decoding (no engine)."""

import struct
import sys
import os.path as osp

import numpy as np
import pytest

cv = pytest.importorskip('cv2')

sys.path.insert(0, osp.join(osp.dirname(__file__), '..', 'scripts'))
from tests.test_protocol import (make_example, _feature_bytes,
                                 _feature_floats, _feature_ints)


def test_decode_example_roundtrip():
    from objectron_eval import decode_example
    rng = np.random.RandomState(0)
    img = rng.randint(0, 255, (60, 80, 3)).astype(np.uint8)
    ok, enc = cv.imencode('.png', img)     # lossless for exact comparison
    kps2d = rng.rand(2, 9, 3).astype(np.float32)
    kps3d = rng.rand(2, 9, 3).astype(np.float32)
    payload = make_example({
        'image/encoded': _feature_bytes([enc.tobytes()]),
        'point_2d': _feature_floats(kps2d.reshape(-1).tolist()),
        'point_3d': _feature_floats(kps3d.reshape(-1).tolist()),
        'instance_num': _feature_ints([2]),
        'object/visibility': _feature_floats([1.0, 0.05]),
        'plane/center': _feature_floats([0., -1., -2.]),
        'plane/normal': _feature_floats([0., 1., 0.]),
    })
    image, p2, p3, vis, (pc, pn) = decode_example(payload)
    assert image.shape == (60, 80, 3)
    assert np.array_equal(image, img)
    assert p2.shape == (2, 9, 2)
    assert np.allclose(p2, kps2d[..., :2], atol=1e-6)
    assert np.allclose(p3, kps3d, atol=1e-6)
    assert np.allclose(vis, [1.0, 0.05], atol=1e-6)
    assert np.allclose(pc, [0, -1, -2]) and np.allclose(pn, [0, 1, 0])


def test_decode_example_empty():
    from objectron_eval import decode_example
    payload = make_example({'instance_num': _feature_ints([0])})
    image, p2, p3, vis, plane = decode_example(payload)
    assert image is None and p2.shape == (0, 9, 2)
