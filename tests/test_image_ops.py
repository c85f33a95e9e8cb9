"""Image-op tests: MXU crop-resize vs gather reference vs cv2."""

import numpy as np
import jax.numpy as jnp
import pytest

from tpudet3d.ops.image import (crop_and_resize, crop_and_resize_gather,
                                resize_bilinear,
                                normalize_images)

cv = pytest.importorskip('cv2')


class TestCropResize:

    def test_mxu_matches_gather(self):
        rng = np.random.RandomState(0)
        img = rng.randint(0, 255, (96, 128, 3)).astype(np.uint8)
        boxes = jnp.asarray([[10., 5., 90., 77.], [0., 0., 128., 96.]])
        a = np.asarray(crop_and_resize(jnp.asarray(img), boxes, (32, 32),
                                       compute_dtype=jnp.float32))
        b = np.asarray(crop_and_resize_gather(jnp.asarray(img), boxes,
                                              (32, 32)))
        assert np.allclose(a, b, atol=1e-2), np.abs(a - b).max()

    def test_matches_cv2(self):
        rng = np.random.RandomState(1)
        img = rng.randint(0, 255, (80, 100, 3)).astype(np.uint8)
        x0, y0, x1, y1 = 10, 20, 74, 68
        ours = np.asarray(crop_and_resize(
            jnp.asarray(img), jnp.asarray([[x0, y0, x1, y1]], jnp.float32),
            (32, 32), compute_dtype=jnp.float32))[0]
        ref = cv.resize(img[y0:y1, x0:x1].astype(np.float32), (32, 32),
                        interpolation=cv.INTER_LINEAR)
        # border rows differ slightly (clamp vs cv2 edge handling)
        assert np.abs(ours[1:-1, 1:-1] - ref[1:-1, 1:-1]).max() < 1.0

    def test_normalize(self):
        img = jnp.full((4, 4, 3), 255.0)
        out = np.asarray(normalize_images(img, (0.5, 0.5, 0.5), (0.25, 0.25, 0.25)))
        assert np.allclose(out, (255 - 127.5) / 63.75)

    def test_resize_shape(self):
        img = jnp.zeros((33, 57, 3))
        out = resize_bilinear(img, (16, 16))
        assert out.shape == (16, 16, 3)
