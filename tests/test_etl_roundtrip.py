"""Full offline ETL round trip without real Objectron data:

synthetic .pbdata (own wire encoder) + synthetic video (cv2)
→ converter (scripts/objectron_2_coco equivalent)
→ COCO JSON + JPEGs on disk
→ the real `Objectron` dataset class
→ BatchLoader batch.
"""

import json
import os
import os.path as osp
import struct

import numpy as np
import pytest

cv = pytest.importorskip('cv2')

from tests.test_converter import _varint, _tag, _f32, _f64, _msg, _s, _vi
from tpudet3d.data.converter import convert, load_annotation_sequence
from tpudet3d.data.dataset import Objectron
from tpudet3d.data.loader import BatchLoader

W, H = 64, 48


def _normalized_kps(rng):
    """9 keypoints well inside the frame, normalized coords."""
    cx, cy = rng.uniform(0.35, 0.65), rng.uniform(0.35, 0.65)
    kps = np.clip(cx + rng.uniform(-0.22, 0.22, (9, 2)), 0.15, 0.85)
    kps[:, 1] = np.clip(cy + rng.uniform(-0.22, 0.22, 9), 0.15, 0.85)
    return kps.astype(np.float32)


def make_pbdata(num_frames, rng):
    obj = _vi(1, 0) + _s(2, 'cup') + _vi(3, 1)
    frames = b''
    all_kps = []
    for fid in range(num_frames):
        kps = _normalized_kps(rng)
        all_kps.append(kps)
        kp_msgs = b''
        for k in range(9):
            p2 = _f32(1, float(kps[k, 0])) + _f32(2, float(kps[k, 1])) + \
                _f32(3, 1.0)
            kp_msgs += _msg(2, _vi(1, k) + _msg(3, p2))
        ann = _vi(1, 0) + kp_msgs + _f32(3, 1.0)
        frames += _msg(2, _vi(1, fid) + _msg(2, ann) + _f64(4, fid * 0.033))
    return _msg(1, obj) + frames, all_kps


@pytest.fixture
def objectron_tree(tmp_path):
    rng = np.random.RandomState(3)
    data_root = tmp_path / 'raw'
    rel = 'cup/batch-1/0'
    (data_root / 'annotation' / 'cup' / 'batch-1').mkdir(parents=True)
    (data_root / 'videos' / 'cup' / 'batch-1' / '0').mkdir(parents=True)
    (data_root / 'index').mkdir()

    pbdata, all_kps = make_pbdata(4, rng)
    with open(data_root / 'annotation' / (rel + '.pbdata'), 'wb') as f:
        f.write(pbdata)
    vid_path = data_root / 'videos' / rel / 'video.MOV'
    vout = cv.VideoWriter(str(vid_path), cv.VideoWriter_fourcc(*'mp4v'),
                          10, (W, H))
    assert vout.isOpened()
    for _ in range(4):
        vout.write(rng.randint(0, 255, (H, W, 3)).astype(np.uint8))
    vout.release()
    with open(data_root / 'index' / 'cup_annotations_train', 'w') as f:
        f.write(rel + '\n')
    with open(data_root / 'index' / 'cup_annotations_test', 'w') as f:
        f.write(rel + '\n')
    return data_root, all_kps


class TestETLRoundTrip:

    def test_sequence_parsing(self, objectron_tree):
        data_root, all_kps = objectron_tree
        entries = load_annotation_sequence(
            str(data_root / 'annotation' / 'cup' / 'batch-1' / '0.pbdata'))
        assert len(entries) == 4
        kp2d, category, counts, _cam = entries[0]
        assert counts == [9]
        assert np.allclose(kp2d[:, :2], all_kps[0], atol=1e-6)

    def test_convert_and_load(self, objectron_tree, tmp_path):
        data_root, all_kps = objectron_tree
        out_root = tmp_path / 'converted'
        for subset in ('train', 'test'):
            convert(str(data_root), str(out_root), subset,
                    obj_classes=('cup',),
                    index_root=str(data_root / 'index'))
        with open(out_root / 'annotations' / 'objectron_train.json') as f:
            coco = json.load(f)
        assert coco['categories'][0]['name'] == 'cup'
        assert len(coco['images']) == 4
        assert len(coco['annotations']) == 4
        ann = coco['annotations'][0]
        assert ann['category_id'] == 1 and len(ann['keypoints']) == 18
        # keypoints written in pixels of the extracted frame
        kp = np.asarray(ann['keypoints']).reshape(9, 2)
        assert np.all(kp[:, 0] <= W) and np.all(kp[:, 1] <= H)

        # feed the converted tree into the real dataset + loader
        ds = Objectron(str(out_root), mode='train', resize=(32, 32),
                       category_list='all')
        assert len(ds) == 4
        img, kps_px, cat = ds[0]
        assert img.shape == (32, 32, 3)
        assert kps_px.shape == (9, 2)
        assert np.all(kps_px >= -1) and np.all(kps_px <= 33)
        loader = BatchLoader(ds, batch_size=2, shuffle=False)
        imgs, kps, cats, n = next(iter(loader))
        assert imgs.shape == (2, 32, 32, 3) and kps.shape == (2, 9, 2)

    def test_test_mode_returns_crop_cords(self, objectron_tree, tmp_path):
        data_root, _ = objectron_tree
        out_root = tmp_path / 'converted2'
        convert(str(data_root), str(out_root), 'test', obj_classes=('cup',),
                index_root=str(data_root / 'index'))
        ds = Objectron(str(out_root), mode='test', resize=(32, 32))
        orig, img, kps, cat, crop_cords = ds[0]
        assert orig.shape[2] == 3 and len(crop_cords) == 4
        x0, y0, x1, y1 = crop_cords
        assert 0 <= x0 < x1 <= W and 0 <= y0 < y1 <= H
