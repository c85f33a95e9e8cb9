"""Small-surface utilities: kp transforms, drawing helpers, PRNG seq."""

import numpy as np
import pytest

from tpudet3d.core import KeySeq, set_random_seed
from tpudet3d.eval.evaluator import Evaluator
from tpudet3d.infer.wrappers import Regressor
from tpudet3d.utils.drawing import (normalize_kp, unnormalize_kp,
                                    unnormalize_img, draw_kp, EDGES)


class TestKpTransforms:

    def test_transform_kp_roundtrip(self):
        """[0,1] crop coords → frame pixels (reference evaluate.py:157-165 /
        ie_wrappers.py:144-152 semantics; both implementations agree)."""
        kp01 = np.asarray([[0.0, 0.0], [1.0, 1.0], [0.5, 0.25]] * 3,
                          np.float32)
        crop = (10, 20, 110, 70)   # w=100, h=50
        a = Evaluator.transform_kp(kp01.copy(), crop)
        b = Regressor.transform_kp(kp01.copy(), crop)
        assert np.allclose(a, b)
        assert np.allclose(a[0], [10, 20])
        assert np.allclose(a[1], [110, 70])
        assert np.allclose(a[2], [60, 32.5])

    def test_normalize_unnormalize(self):
        kp = np.asarray([[16, 8]] * 9, np.float32)
        n = normalize_kp((32, 64, 3), kp)       # h=32, w=64
        assert np.allclose(n[0], [0.25, 0.25])
        back = unnormalize_kp((32, 64, 3), n)
        assert np.allclose(back, kp)

    def test_unnormalize_img_chw(self):
        img = np.zeros((3, 4, 4), np.float32)
        out = unnormalize_img(img)
        assert out.shape == (4, 4, 3)
        assert np.allclose(out[0, 0], np.asarray([0.5931, 0.4690, 0.4229]) * 255)


class TestDrawing:

    def test_draw_kp_writes_wireframe(self):
        img = np.zeros((64, 64, 3), np.uint8)
        kp = np.clip(np.random.RandomState(0).rand(9, 2), 0.2, 0.8)
        out = draw_kp(img, kp, normalized=True, RGB=False)
        assert out.sum() > 0
        assert len(EDGES) == 12   # box wireframe

    def test_draw_kp_with_label_and_save(self, tmp_path):
        img = np.zeros((200, 200, 3), np.uint8)
        kp = np.clip(np.random.RandomState(1).rand(9, 2), 0.2, 0.8)
        path = str(tmp_path / 'out.jpg')
        draw_kp(img, kp, name=path, normalized=True, RGB=True, label='cup')
        import os
        assert os.path.exists(path)


class TestPRNG:

    def test_keyseq(self):
        ks = KeySeq(0)
        a = ks.next()
        b = ks.next()
        assert not np.array_equal(np.asarray(a), np.asarray(b))
        three = ks.next(3)
        assert len(three) == 3

    def test_set_random_seed_reproducible(self):
        k1 = set_random_seed(7)
        r1 = np.random.rand(3)
        k2 = set_random_seed(7)
        r2 = np.random.rand(3)
        assert np.allclose(r1, r2)
        assert np.array_equal(np.asarray(k1), np.asarray(k2))
