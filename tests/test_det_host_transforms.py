"""Expand + MinIoURandomCrop host augs for the detector."""

import numpy as np
import pytest

cv = pytest.importorskip('cv2')

from tpudet3d.data.det_host_transforms import (build_detection_host_pipeline,
                                               _expand, _min_iou_crop,
                                               _iou_with_patch)


def sample():
    img = np.zeros((100, 100, 3), np.uint8)
    img[20:60, 30:70] = 200
    boxes = np.zeros((4, 4), np.float32)
    boxes[0] = [30, 20, 70, 60]
    labels = np.zeros(4, np.int32)
    labels[0] = 3
    valid = np.zeros(4, bool)
    valid[0] = True
    return img, boxes, labels, valid


class TestDetHostAugs:

    def test_expand_keeps_box_on_content(self):
        img, boxes, labels, valid = sample()
        rng = np.random.RandomState(1)
        for _ in range(5):
            out, out_boxes = _expand(rng, img, boxes)
            x0, y0, x1, y1 = out_boxes[0].astype(int)
            patch = out[y0:y1, x0:x1]
            assert patch.max() == 200        # the box still covers content

    def test_min_iou_crop_box_validity(self):
        img, boxes, labels, valid = sample()
        rng = np.random.RandomState(2)
        for _ in range(10):
            out, ob, ol, ov = _min_iou_crop(rng, img, boxes, labels, valid)
            kept = ob[ov]
            assert np.all(kept[:, 2] >= kept[:, 0])
            assert np.all(kept[:, 3] >= kept[:, 1])
            if ov.any():
                assert ol[ov][0] in (0, 3)

    def test_pipeline_fixed_output_size(self):
        fn = build_detection_host_pipeline(input_size=128, seed=0)
        img, boxes, labels, valid = sample()
        out, ob, ol, ov = fn(0, 0, img, boxes, labels, valid)
        assert out.shape == (128, 128, 3)
        assert ob.shape == boxes.shape and ov.dtype == bool
        kept = ob[ov]
        assert np.all((kept >= -1e-3) & (kept <= 128 + 1e-3))

    def test_deterministic(self):
        fn = build_detection_host_pipeline(input_size=128, seed=5)
        img, boxes, labels, valid = sample()
        a = fn(1, 2, img.copy(), boxes.copy(), labels.copy(), valid.copy())
        b = fn(1, 2, img.copy(), boxes.copy(), labels.copy(), valid.copy())
        assert np.array_equal(a[0], b[0]) and np.allclose(a[1], b[1])

    def test_iou_with_patch(self):
        boxes = np.asarray([[0., 0., 10., 10.]])
        patch = np.asarray([0., 0., 10., 10.])
        assert abs(_iou_with_patch(boxes, patch)[0] - 1.0) < 1e-9
