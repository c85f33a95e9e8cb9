"""Synthetic-scene generator: exact-geometry guarantees.

The whole point of SyntheticScene is that the vendor protocol is
*meaningful* on it: portrait-convention 2D keypoints must lift (EPnP,
portrait=True) back to the exact 3D box after ground-plane scale recovery.
These tests pin that chain end to end with no model in the loop.
"""

import numpy as np
import pytest

from tpudet3d.data.synthetic_scene import (SyntheticScene, SceneDetection,
                                           SceneCrops, write_eval_shards,
                                           REGRESSOR_TO_DETECTOR_CLS)
from tpudet3d.core import DETECTOR_TO_REGRESSOR_CLS
from tpudet3d.ops.geometry import lift_2d_batched


def scene():
    return SyntheticScene(length=8, frame_hw=(240, 320), seed=5,
                          min_objects=1, max_objects=3)


class TestGeometry:

    def test_lift_recovers_3d_up_to_scale(self):
        s = scene().sample(0)
        lifted = np.asarray(lift_2d_batched(s['kps2d'], portrait=True),
                            np.float64)
        gt = s['kps3d'].astype(np.float64)
        for lft, g in zip(lifted, gt):
            # same box up to one positive scalar
            ratio = g / np.where(np.abs(lft) < 1e-9, 1e-9, lft)
            med = np.median(ratio)
            assert med > 0
            assert np.allclose(lft * med, g, atol=5e-3), (lft * med - g)

    def test_plane_scale_recovery_is_exact(self):
        from tpudet3d.eval.protocol import compute_scale
        s = scene().sample(1)
        lifted = np.asarray(lift_2d_batched(s['kps2d'], portrait=True),
                            np.float64)
        for lft, g in zip(lifted, s['kps3d'].astype(np.float64)):
            scale = compute_scale(lft, s['plane'])
            assert np.allclose(lft * scale, g, atol=1e-2), \
                np.abs(lft * scale - g).max()

    def test_bottom_face_on_plane(self):
        s = scene().sample(2)
        center, normal = s['plane']
        d0 = float(np.dot(center, normal))
        for box in s['kps3d']:
            dots = np.sort(box[1:] @ normal)
            assert np.allclose(dots[:4], d0, atol=1e-5)

    def test_gt_as_prediction_gives_perfect_ap(self):
        """Feeding GT keypoints as predictions through the full protocol
        (lift + plane scale + 3D IoU/ADD/viewpoint) must produce AP ≈ 1 in
        every non-degenerate threshold bin."""
        from tpudet3d.eval.protocol import ObjectronProtocolEvaluator
        ev = ObjectronProtocolEvaluator()
        sc = scene()
        for i in range(4):
            s = sc.sample(i)
            pred3d = np.asarray(lift_2d_batched(s['kps2d'], portrait=True))
            ev.evaluate_example(
                [k for k in s['kps2d']], [p for p in pred3d],
                [k for k in s['kps2d']], [g for g in s['kps3d']],
                plane=s['plane'], visibilities=np.ones(len(s['labels'])))
        ev.finalize()
        # IoU bins: hit iff iou > thresh; exact recovery → IoU ≈ 1
        assert np.all(ev._ap_iou.aps[:-1] >= 0.999), ev._ap_iou.aps
        # error bins (≤ thresh): exact → every bin except the 0-threshold
        for ap in (ev._ap_pixel, ev._ap_add, ev._ap_adds, ev._ap_azimuth,
                   ev._ap_polar):
            assert np.all(ap.aps[1:] >= 0.999), ap.aps
        assert ev._sum_iou / ev._matched > 0.98
        assert ev._sum_pixel / ev._matched < 1e-4


class TestDatasets:

    def test_class_mapping_roundtrip(self):
        for det_id, reg_id in enumerate(DETECTOR_TO_REGRESSOR_CLS):
            assert REGRESSOR_TO_DETECTOR_CLS[reg_id] == det_id

    def test_scene_detection_items(self):
        ds = SceneDetection(scene(), input_size=300)
        img, boxes, labels, valid = ds[0]
        assert img.shape == (300, 300, 3) and img.dtype == np.uint8
        n = int(valid.sum())
        assert n >= 1
        b = boxes[:n]
        assert np.all(b[:, 2:] > b[:, :2])
        assert np.all(b >= 0) and np.all(b <= 300)
        assert np.all(labels[:n] >= 0) and np.all(labels[:n] < 9)

    def test_scene_crops_items(self):
        ds = SceneCrops(scene(), resize=(128, 128))
        img, kps, cat = ds[3]
        assert img.shape == (128, 128, 3)
        assert kps.shape == (9, 2)
        assert np.all(kps >= -1e-3) and np.all(kps <= 128 + 1e-3)
        assert 0 <= cat < 9

    def test_scene_crops_margin_jitter(self):
        """Train mode jitters the crop margin (deploy-robustness to noisy
        detector boxes); val/test keep the reference's exact ±10 px, and
        keypoints always stay inside the crop."""
        train = SceneCrops(scene(), resize=(128, 128), mode='train')
        val = SceneCrops(scene(), resize=(128, 128), mode='val')
        # same index twice → deterministic
        k1 = train[5][1]
        k2 = train[5][1]
        np.testing.assert_array_equal(k1, k2)
        # jitter: at least one index differs from the fixed-margin crop
        diffs = [not np.allclose(train[i][1], val[i][1]) for i in range(6)]
        assert any(diffs)
        for i in range(6):
            kps = train[i][1]
            assert np.all(kps >= -1e-3) and np.all(kps <= 128 + 1e-3)
        # epoch-varying draws (BatchLoader.set_epoch) — deterministic per
        # (idx, epoch) but different across epochs
        train.set_epoch(1)
        k_e1 = train[5][1]
        assert not np.allclose(k1, k_e1)
        train.set_epoch(0)
        np.testing.assert_array_equal(train[5][1], k1)

    def test_loader_factory_scene_branch(self):
        """cfg.data.synthetic='scene' routes build_loader to SceneCrops with
        disjoint per-split scene seeds and the standard item contracts."""
        from tpudet3d.core import AttrDict
        from tpudet3d.data.loader import _make_dataset
        cfg = AttrDict(data=dict(synthetic='scene', synthetic_length=8,
                                 resize=(96, 96), scene_seed=3,
                                 category_list='all'))
        train = _make_dataset(cfg, 'train')
        val = _make_dataset(cfg, 'val')
        test = _make_dataset(cfg, 'test')
        assert isinstance(train, SceneCrops)
        assert len(train) == 16 and len(val) == 4
        assert len({train.scene.seed, val.scene.seed,
                    test.scene.seed}) == 3
        img, kps, cat = train[0]
        assert img.shape == (96, 96, 3) and kps.shape == (9, 2)
        frame, crop, kps, cat, coords = test[0]
        assert frame.ndim == 3 and crop.shape == (96, 96, 3)
        assert len(coords) == 4 and 0 <= cat < 9

    def test_scene_cache_roundtrip(self, tmp_path):
        """Cached scenes reload bit-identically (PNG frame + exact
        float keypoints), so cached and uncached runs are equivalent."""
        from tpudet3d.data.synthetic_scene import SyntheticScene
        cold = SyntheticScene(length=2, seed=5, cache_dir=str(tmp_path))
        s0 = cold.sample(0)            # renders + stores
        warm = SyntheticScene(length=2, seed=5, cache_dir=str(tmp_path))
        s1 = warm.sample(0)            # loads from cache
        np.testing.assert_array_equal(s0['kps2d'], s1['kps2d'])
        np.testing.assert_array_equal(s0['kps3d'], s1['kps3d'])
        np.testing.assert_array_equal(s0['labels'], s1['labels'])
        np.testing.assert_array_equal(s0['plane'][0], s1['plane'][0])
        np.testing.assert_array_equal(s1['img'], s0['img'])
        # no cache dir → pure render, same geometry
        plain = SyntheticScene(length=2, seed=5)
        np.testing.assert_array_equal(plain.sample(0)['kps2d'], s0['kps2d'])

    def test_eval_shards_readable(self, tmp_path):
        from tpudet3d.eval.protocol import read_tfrecord, parse_example
        write_eval_shards(str(tmp_path), ['cup'], per_class=3,
                          frame_hw=(120, 160), seed=9)
        shard = tmp_path / 'cup' / 'shard-00000'
        payloads = list(read_tfrecord(str(shard)))
        assert len(payloads) == 3
        feats = parse_example(payloads[0])
        n = feats['instance_num']['ints'][0]
        assert n >= 1
        assert len(feats['point_2d']['floats']) == n * 27
        assert len(feats['point_3d']['floats']) == n * 27
        assert len(feats['plane/normal']['floats']) == 3
        cv = pytest.importorskip('cv2')
        img = cv.imdecode(
            np.frombuffer(feats['image/encoded']['bytes'][0], np.uint8),
            cv.IMREAD_COLOR)
        assert img.shape == (120, 160, 3)


class TestTFRecordWire:
    """The shard wire format itself (ADVICE r2: real masked CRC32C so the
    VENDOR reader — tf.data.TFRecordDataset, which verifies the length CRC
    — consumes our shards, not only the repo's tolerant reader)."""

    def test_crc32c_check_value(self):
        from tpudet3d.core.crc32c import crc32c, masked_crc32c
        # the CRC-32C check value (RFC 3720 appendix) + a masking pin
        assert crc32c(b'123456789') == 0xE3069283
        assert crc32c(b'') == 0
        assert masked_crc32c(b'123456789') == (
            (((0xE3069283 >> 15) | (0xE3069283 << 17)) + 0xa282ead8)
            & 0xFFFFFFFF)

    def test_reader_verifies_crc(self, tmp_path):
        from tpudet3d.eval.protocol import read_tfrecord
        write_eval_shards(str(tmp_path), ['cup'], per_class=2,
                          frame_hw=(120, 160), seed=9)
        shard = str(tmp_path / 'cup' / 'shard-00000')
        assert len(list(read_tfrecord(shard, verify_crc=True))) == 2
        # flip one payload byte -> data CRC must catch it
        blob = bytearray(open(shard, 'rb').read())
        blob[40] ^= 0xFF
        bad = tmp_path / 'cup' / 'bad'
        bad.write_bytes(bytes(blob))
        with pytest.raises(ValueError, match='CRC'):
            list(read_tfrecord(str(bad), verify_crc=True))

    def test_vendor_reader_consumes_shards(self, tmp_path):
        """End-to-end vendor-parity: tf.data.TFRecordDataset +
        tf.train.Example.FromString (exactly the reference ingestion,
        objectron_eval.py:273-275 and :88) read our shards and see the
        same features our pure-python reader decodes."""
        tf = pytest.importorskip('tensorflow')
        from tpudet3d.eval.protocol import read_tfrecord, parse_example
        write_eval_shards(str(tmp_path), ['shoe'], per_class=2,
                          frame_hw=(120, 160), seed=13)
        shard = str(tmp_path / 'shoe' / 'shard-00000')
        vendor = [r.numpy() for r in tf.data.TFRecordDataset([shard])]
        ours = list(read_tfrecord(shard, verify_crc=True))
        assert len(vendor) == 2
        for v, o in zip(vendor, ours):
            assert v == o
            ex = tf.train.Example.FromString(v)
            feats = ex.features.feature
            mine = parse_example(o)
            n = feats['instance_num'].int64_list.value[0]
            assert n == mine['instance_num']['ints'][0]
            np.testing.assert_allclose(
                list(feats['point_2d'].float_list.value),
                mine['point_2d']['floats'])
            np.testing.assert_allclose(
                list(feats['point_3d'].float_list.value),
                mine['point_3d']['floats'])
            np.testing.assert_allclose(
                list(feats['plane/center'].float_list.value),
                mine['plane/center']['floats'])
            assert feats['image/encoded'].bytes_list.value[0] == \
                mine['image/encoded']['bytes'][0]
