"""Self-labeled (detector-box) training crops: tpudet3d/data/selflabel.py
+ SceneCrops(det_boxes=...).  The detector forward itself is exercised on
hardware by scripts/selflabel_boxes.py; here the matching logic and the
dataset's deploy-geometry crop path are pinned with fabricated boxes."""

import numpy as np
import pytest

from tpudet3d.data.selflabel import match_boxes_to_gt, load_selflabel_boxes
from tpudet3d.data.synthetic_scene import SyntheticScene, SceneCrops


class TestMatchBoxesToGt:
    def test_exact_match(self):
        gt = np.array([[10, 10, 50, 50], [100, 100, 160, 150]], np.float32)
        pred = np.array([[101, 98, 158, 149], [12, 9, 48, 52]], np.float32)
        boxes, valid = match_boxes_to_gt(pred, gt)
        assert valid.all()
        np.testing.assert_allclose(boxes[0], pred[1])
        np.testing.assert_allclose(boxes[1], pred[0])

    def test_below_threshold_unmatched(self):
        gt = np.array([[10, 10, 50, 50]], np.float32)
        pred = np.array([[200, 200, 240, 240]], np.float32)
        _, valid = match_boxes_to_gt(pred, gt, iou_thr=0.25)
        assert not valid.any()

    def test_one_pred_serves_one_gt(self):
        # two overlapping GTs, one prediction: only the better-IoU GT wins
        gt = np.array([[10, 10, 50, 50], [12, 12, 52, 52]], np.float32)
        pred = np.array([[12, 12, 52, 52]], np.float32)
        boxes, valid = match_boxes_to_gt(pred, gt, iou_thr=0.25)
        assert valid.sum() == 1
        assert valid[1] and not valid[0]

    def test_empty(self):
        boxes, valid = match_boxes_to_gt(np.zeros((0, 4)), np.zeros((0, 4)))
        assert boxes.shape == (0, 4) and valid.shape == (0,)


def _write_boxes(tmp_path, scene, shift=4.0):
    """Fabricate an npz with boxes = GT extents shifted by ``shift`` px."""
    h, w = scene.frame_hw
    n = len(scene)
    boxes = np.zeros((n, scene.max_objects, 4), np.float32)
    valid = np.zeros((n, scene.max_objects), bool)
    for i in range(n):
        s = scene.sample(i)
        kps_px = s['kps2d'] * np.asarray([w, h], np.float32)
        gt = np.concatenate([kps_px.min(1), kps_px.max(1)], axis=1)
        k = len(gt)
        boxes[i, :k] = gt + np.asarray([shift, shift, shift, shift])
        valid[i, :k] = True
    path = str(tmp_path / 'boxes.npz')
    np.savez(path, boxes=boxes, valid=valid, seed=scene.seed,
             length=n, frame_hw=np.asarray(scene.frame_hw),
             score_thr=0.05, iou_match=0.25)
    return path


class TestSceneCropsSelflabel:
    def _scene(self):
        return SyntheticScene(length=4, frame_hw=(240, 320), seed=11,
                              min_objects=1, max_objects=2)

    def test_det_crop_geometry(self, tmp_path):
        scene = self._scene()
        path = _write_boxes(tmp_path, scene, shift=6.0)
        ds_sl = SceneCrops(scene, resize=(64, 64), mode='train',
                           det_boxes=path, selflabel_p=1.0,
                           selflabel_margin=10.0)
        # reproduce expected crop by hand for item 0
        s = scene.sample(0)
        h, w = s['img'].shape[:2]
        kps_px = s['kps2d'][0] * np.asarray([w, h], np.float32)
        clipped = np.stack([np.clip(kps_px[:, 0], 3, w - 3),
                            np.clip(kps_px[:, 1], 3, h - 3)], 1)
        gt = np.concatenate([clipped.min(0), clipped.max(0)])
        det = np.concatenate([kps_px.min(0), kps_px.max(0)]) + 6.0
        x0 = int(np.clip(det[0] - 10, 0, w))
        y0 = int(np.clip(det[1] - 10, 0, h))
        x1 = int(np.clip(det[2] + 10, 0, w))
        y1 = int(np.clip(det[3] + 10, 0, h))
        img, kps, cat = ds_sl[0]
        assert img.shape == (64, 64, 3)
        exp = np.stack([np.clip(clipped[:, 0] - x0, 0, x1 - x0),
                        np.clip(clipped[:, 1] - y0, 0, y1 - y0)], 1)
        exp *= np.asarray([64 / (x1 - x0), 64 / (y1 - y0)], np.float32)
        np.testing.assert_allclose(kps, exp, atol=1e-4)
        assert 0 <= cat < 9

    def test_p_zero_matches_plain(self, tmp_path):
        scene = self._scene()
        path = _write_boxes(tmp_path, scene)
        ds_sl = SceneCrops(scene, resize=(64, 64), mode='train',
                           det_boxes=path, selflabel_p=0.0)
        ds = SceneCrops(scene, resize=(64, 64), mode='train')
        for i in range(len(ds)):
            a, b = ds_sl[i], ds[i]
            np.testing.assert_array_equal(a[0], b[0])
            np.testing.assert_allclose(a[1], b[1])
            assert a[2] == b[2]

    def test_val_mode_ignores_det_boxes(self, tmp_path):
        scene = self._scene()
        path = _write_boxes(tmp_path, scene)
        ds = SceneCrops(scene, resize=(64, 64), mode='val',
                        det_boxes=path, selflabel_p=1.0)
        assert ds._det_boxes is None

    def test_deterministic_per_epoch(self, tmp_path):
        scene = self._scene()
        path = _write_boxes(tmp_path, scene)
        ds = SceneCrops(scene, resize=(64, 64), mode='train',
                        det_boxes=path, selflabel_p=0.5)
        ds.set_epoch(3)
        a = [ds[i] for i in range(len(ds))]
        b = [ds[i] for i in range(len(ds))]
        for x, y in zip(a, b):
            np.testing.assert_array_equal(x[0], y[0])
        # different epoch changes at least one item (jitter or mix draw)
        ds.set_epoch(4)
        c = [ds[i] for i in range(len(ds))]
        assert any(not np.array_equal(x[0], y[0]) for x, y in zip(a, c))

    def test_mismatched_stream_rejected(self, tmp_path):
        scene = self._scene()
        path = _write_boxes(tmp_path, scene)
        other = SyntheticScene(length=4, frame_hw=(240, 320), seed=12)
        with pytest.raises(ValueError, match='regenerate'):
            load_selflabel_boxes(path, other)
