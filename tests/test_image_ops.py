"""Image-op tests: MXU crop-resize vs gather reference vs cv2."""

import numpy as np
import jax.numpy as jnp
import pytest

from tpudet3d.ops.image import (crop_and_resize, crop_and_resize_gather,
                                crop_and_resize_windowed, resize_bilinear,
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

    def test_windowed_matches_full_for_fitting_boxes(self):
        # boxes with both sides ≤ win−4 take the level-0 window — the
        # resample is the same math as the full-frame path, just shifted
        rng = np.random.RandomState(2)
        img = rng.randint(0, 255, (96, 128, 3)).astype(np.uint8)
        boxes = jnp.asarray([[10., 5., 60., 57.],     # interior
                             [0., 0., 50., 50.],      # corner
                             [70., 40., 127., 95.]])  # bottom-right edge
        a = np.asarray(crop_and_resize(jnp.asarray(img), boxes, (32, 32),
                                       compute_dtype=jnp.float32))
        w = np.asarray(crop_and_resize_windowed(
            jnp.asarray(img), boxes, (32, 32), win=64,
            compute_dtype=jnp.float32))
        assert np.allclose(a, w, atol=1e-3), np.abs(a - w).max()

    def test_windowed_oversized_box_level1(self):
        # bilinear resampling of a linear ramp is exact, so even the
        # double-resampled squash level must reproduce the direct crop
        yy, xx = np.mgrid[0:96, 0:128].astype(np.float32)
        img = np.stack([yy, xx, yy + xx], axis=-1)
        boxes = jnp.asarray([[2., 3., 120., 90.]])    # > win−4 per side
        a = np.asarray(crop_and_resize(jnp.asarray(img), boxes, (32, 32),
                                       compute_dtype=jnp.float32))
        w = np.asarray(crop_and_resize_windowed(
            jnp.asarray(img), boxes, (32, 32), win=64,
            compute_dtype=jnp.float32))
        assert np.allclose(a, w, atol=0.05), np.abs(a - w).max()

    def test_windowed_frame_smaller_than_window(self):
        rng = np.random.RandomState(3)
        img = rng.randint(0, 255, (40, 50, 3)).astype(np.uint8)
        boxes = jnp.asarray([[5., 5., 45., 35.], [0., 0., 50., 40.]])
        a = np.asarray(crop_and_resize(jnp.asarray(img), boxes, (32, 32),
                                       compute_dtype=jnp.float32))
        w = np.asarray(crop_and_resize_windowed(
            jnp.asarray(img), boxes, (32, 32), win=64,
            compute_dtype=jnp.float32))
        assert np.allclose(a, w, atol=1e-3), np.abs(a - w).max()

    def test_windowed_bf16_dtype(self):
        rng = np.random.RandomState(4)
        img = rng.randint(0, 255, (96, 128, 3)).astype(np.uint8)
        boxes = jnp.asarray([[10., 5., 60., 57.]])
        out = crop_and_resize_windowed(jnp.asarray(img), boxes, (32, 32),
                                       win=64)
        assert out.shape == (1, 32, 32, 3) and out.dtype == jnp.bfloat16

    def test_normalize(self):
        img = jnp.full((4, 4, 3), 255.0)
        out = np.asarray(normalize_images(img, (0.5, 0.5, 0.5), (0.25, 0.25, 0.25)))
        assert np.allclose(out, (255 - 127.5) / 63.75)

    def test_resize_shape(self):
        img = jnp.zeros((33, 57, 3))
        out = resize_bilinear(img, (16, 16))
        assert out.shape == (16, 16, 3)
