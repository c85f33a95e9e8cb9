"""Device-augmentation parity tests vs cv2 / albumentations semantics."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tpudet3d.core import AttrDict
from tpudet3d.data.transforms import (build_augmentations, _rotation_matrix,
                                      _scale_by_angle, _affine_warp,
                                      _apply_affine_kp)

cv = pytest.importorskip('cv2')

NORM = dict(mean=[0.5931, 0.4690, 0.4229], std=[0.2471, 0.2214, 0.2157])


def pipeline_cfg(train_steps):
    return AttrDict(train_data_pipeline=train_steps,
                    test_data_pipeline=[('normalize', NORM),
                                        ('to_tensor', dict())])


class TestAffine:

    def test_rotation_matrix_matches_cv2(self):
        m_ours = np.asarray(_rotation_matrix(32.0, 24.0, 17.0, 0.9))[:2]
        m_cv = cv.getRotationMatrix2D((32.0, 24.0), 17.0, 0.9)
        assert np.allclose(m_ours, m_cv, atol=1e-5)

    def test_scale_by_angle_keeps_frame_inside(self):
        for angle in (5.0, 10.0, 45.0):
            s = float(_scale_by_angle(jnp.float32(angle), 64.0, 64.0))
            assert 0 < s <= 1.0

    def test_warp_matches_cv2(self):
        rng = np.random.RandomState(0)
        img = rng.randint(0, 255, (48, 64, 3)).astype(np.float32)
        m = cv.getRotationMatrix2D((32.0, 24.0), 12.0, 0.95)
        ref = cv.warpAffine(img, m, (64, 48), flags=cv.INTER_LINEAR)
        m3 = np.vstack([m, [0, 0, 1]])
        ours = np.asarray(_affine_warp(jnp.asarray(img),
                                       jnp.asarray(np.linalg.inv(m3))))
        # interior parity (borders differ: cv2 constant vs clamped sampling)
        assert np.abs(ours[4:-4, 4:-4] - ref[4:-4, 4:-4]).max() < 2.0

    def test_kp_affine(self):
        m = _rotation_matrix(10.0, 10.0, 90.0, 1.0)
        kp = jnp.asarray([[10.0, 0.0]])
        out = np.asarray(_apply_affine_kp(kp, m))
        # 90° CCW about (10,10): (10,0) → (0,10)  (y-down image coords)
        assert np.allclose(out, [[0.0, 10.0]], atol=1e-4)


class TestPipelines:

    def test_flip_tracks_keypoints(self):
        cfg = pipeline_cfg([('horizontal_flip', dict(p=1.0)),
                            ('normalize', NORM), ('to_tensor', dict())])
        train_fn, _ = build_augmentations(cfg)
        rng = np.random.RandomState(0)
        img = rng.randint(0, 255, (1, 32, 32, 3)).astype(np.uint8)
        kp = np.asarray([[[4.0, 7.0]] * 9], np.float32)
        out_img, out_kp = jax.jit(train_fn)(jnp.asarray(img), jnp.asarray(kp),
                                            jax.random.PRNGKey(0))
        assert np.allclose(np.asarray(out_kp)[0, 0],
                           [(31 - 4) / 32, 7 / 32], atol=1e-5)
        # flipped pixel content
        ref = (img[0, :, ::-1, :].astype(np.float32) -
               np.asarray(NORM['mean']) * 255) / (np.asarray(NORM['std']) * 255)
        assert np.abs(np.asarray(out_img)[0] - ref).max() < 1e-4

    def test_rotate_keeps_kp_on_feature(self):
        """Draw a dot, rotate, verify the keypoint still lands on the dot
        (device rotate variant; production uses the host cv2 path)."""
        cfg = pipeline_cfg([('random_rotate', dict(angle_limit=25., p=1.0)),
                            ('to_tensor', dict())])
        train_fn, _ = build_augmentations(cfg, host_geometric=False)
        img = np.zeros((1, 64, 64, 3), np.uint8)
        img[0, 40:44, 18:22] = 255
        kp = np.asarray([[[20.0, 42.0]] * 9], np.float32)
        out_img, out_kp = jax.jit(train_fn)(jnp.asarray(img), jnp.asarray(kp),
                                            jax.random.PRNGKey(3))
        out_img = np.asarray(out_img)[0]
        x, y = (np.asarray(out_kp)[0, 0] * 64).astype(int)
        window = out_img[max(y - 3, 0):y + 4, max(x - 3, 0):x + 4]
        assert window.max() > 100, 'keypoint lost the rotated feature'

    def test_test_pipeline_deterministic(self):
        cfg = pipeline_cfg([])
        _, test_fn = build_augmentations(cfg)
        rng = np.random.RandomState(0)
        img = rng.randint(0, 255, (2, 16, 16, 3)).astype(np.uint8)
        kp = rng.rand(2, 9, 2).astype(np.float32) * 16
        a = test_fn(jnp.asarray(img), jnp.asarray(kp), jax.random.PRNGKey(0))
        b = test_fn(jnp.asarray(img), jnp.asarray(kp), jax.random.PRNGKey(9))
        assert np.allclose(np.asarray(a[0]), np.asarray(b[0]))
        assert np.allclose(np.asarray(a[1]), np.asarray(b[1]))

    def test_host_rotate_keeps_kp_on_feature(self):
        """Host cv2 rotate (production path for geometric warps)."""
        from tpudet3d.data.host_transforms import build_host_pipeline
        fn = build_host_pipeline([('random_rotate',
                                   dict(angle_limit=25., p=1.0))], seed=3)
        img = np.zeros((64, 64, 3), np.uint8)
        img[40:44, 18:22] = 255
        kps = np.asarray([[20.0, 42.0]] * 9, np.float32)
        out_img, out_kps = fn(0, 0, img, kps)
        x, y = out_kps[0].astype(int)
        window = out_img[max(y - 3, 0):y + 4, max(x - 3, 0):x + 4]
        assert window.max() > 100

    def test_host_pipeline_deterministic(self):
        from tpudet3d.data.host_transforms import build_host_pipeline
        fn = build_host_pipeline([('random_rotate',
                                   dict(angle_limit=15., p=0.7))], seed=1)
        img = np.random.RandomState(0).randint(0, 255, (32, 32, 3), np.uint8)
        kps = np.random.RandomState(1).rand(9, 2).astype(np.float32) * 32
        a = fn(2, 5, img.copy(), kps.copy())
        b = fn(2, 5, img.copy(), kps.copy())
        assert np.array_equal(a[0], b[0]) and np.allclose(a[1], b[1])

    def test_device_pipeline_skips_host_geometric(self):
        cfg = pipeline_cfg([('random_rotate', dict(angle_limit=25., p=1.0)),
                            ('to_tensor', dict())])
        train_fn, _ = build_augmentations(cfg)   # host_geometric default
        img = np.random.RandomState(0).randint(0, 255, (1, 16, 16, 3), np.uint8)
        kp = np.zeros((1, 9, 2), np.float32) + 4
        out_img, out_kp = train_fn(jnp.asarray(img), jnp.asarray(kp),
                                   jax.random.PRNGKey(0))
        # rotate excluded → image content unchanged (only to_tensor ran)
        assert np.allclose(np.asarray(out_img)[0], img[0].astype(np.float32))

    def test_one_of_selects_single_branch(self):
        cfg = pipeline_cfg([('one_of', dict(transforms=[
            ('random_brightness_contrast', dict(p=1.0)),
            ('rgb_shift', dict(p=1.0))], p=1.0)),
            ('to_tensor', dict())])
        train_fn, _ = build_augmentations(cfg)
        img = np.full((1, 16, 16, 3), 100, np.uint8)
        kp = np.zeros((1, 9, 2), np.float32)
        out_img, _ = jax.jit(train_fn)(jnp.asarray(img), jnp.asarray(kp),
                                       jax.random.PRNGKey(1))
        assert np.isfinite(np.asarray(out_img)).all()


class TestColorFormulaGolden:
    """Exact-formula golden tests (VERDICT r1 item 6).  albumentations is
    not installed here; references are cv2 (which albumentations wraps) and
    hand-written numpy implementations of the documented formulas."""

    def _img(self, seed=0, shape=(24, 32, 3)):
        return np.random.RandomState(seed).randint(
            0, 256, shape).astype(np.float32)

    def test_rgb_hsv_roundtrip(self):
        from tpudet3d.data.transforms import rgb_to_hsv, hsv_to_rgb
        img = self._img()
        h, s, v = rgb_to_hsv(jnp.asarray(img))
        back = np.asarray(hsv_to_rgb(h, s, v))
        np.testing.assert_allclose(back, img, atol=1e-2)

    def test_rgb_to_hsv_matches_cv2(self):
        from tpudet3d.data.transforms import rgb_to_hsv
        img = self._img(1)
        h, s, v = (np.asarray(x) for x in rgb_to_hsv(jnp.asarray(img)))
        # cv2 float32 HSV: H in degrees [0,360), S in [0,1], V = max
        ref = cv.cvtColor(img / 255.0, cv.COLOR_RGB2HSV)
        np.testing.assert_allclose(h, ref[..., 0], atol=0.05)
        np.testing.assert_allclose(s / 255.0, ref[..., 1], atol=1e-3)
        np.testing.assert_allclose(v / 255.0, ref[..., 2], atol=1e-3)

    def test_hue_saturation_value_matches_cv2_reference(self):
        """Reference = albumentations shift_hsv formula written with cv2
        float HSV: h+shift*2° (mod 360), s/v additive with clip."""
        from tpudet3d.data.transforms import hue_saturation_value
        img = self._img(2)
        fn, _p = hue_saturation_value(hue_shift_limit=20, sat_shift_limit=30,
                                      val_shift_limit=20)
        key = jax.random.PRNGKey(3)
        out = np.asarray(fn(key, jnp.asarray(img), jnp.zeros((9, 2)))[0])
        # reproduce the same sampled shifts
        k1, k2, k3 = jax.random.split(key, 3)
        hs = float(jax.random.uniform(k1, minval=-20., maxval=20.))
        ss = float(jax.random.uniform(k2, minval=-30., maxval=30.))
        vs = float(jax.random.uniform(k3, minval=-20., maxval=20.))
        hsv = cv.cvtColor(img / 255.0, cv.COLOR_RGB2HSV)
        hsv[..., 0] = (hsv[..., 0] + hs * 2.0) % 360.0
        hsv[..., 1] = np.clip(hsv[..., 1] + ss / 255.0, 0, 1)
        hsv[..., 2] = np.clip(hsv[..., 2] + vs / 255.0, 0, 1)
        ref = cv.cvtColor(hsv, cv.COLOR_HSV2RGB) * 255.0
        np.testing.assert_allclose(out, ref, atol=0.35)

    def test_blur_matches_cv2_blur(self):
        from tpudet3d.data.transforms import _mean_blur
        img = self._img(4, (20, 26, 3))
        for k in (3, 5):
            ours = np.asarray(_mean_blur(jnp.asarray(img), k))
            ref = cv.blur(img, (k, k))   # default BORDER_REFLECT_101
            np.testing.assert_allclose(ours, ref, atol=1e-2)

    def test_blur_samples_only_odd_sizes_leq_limit(self):
        from tpudet3d.data.transforms import blur
        img = jnp.asarray(self._img(5, (16, 16, 3)))
        fn, _p = blur(blur_limit=7)
        seen = set()
        for i in range(24):
            out = np.asarray(fn(jax.random.PRNGKey(i), img,
                                jnp.zeros((9, 2)))[0])
            for k in (3, 5, 7):
                if np.allclose(out, cv.blur(np.asarray(img), (k, k)),
                               atol=1e-2):
                    seen.add(k)
        assert seen == {3, 5, 7}

    def test_brightness_contrast_matches_albumentations_formula(self):
        """albumentations RandomBrightnessContrast (brightness_by_max=True):
        clip(img * alpha + beta * 255)."""
        from tpudet3d.data.transforms import random_brightness_contrast
        img = self._img(6)
        fn, _p = random_brightness_contrast(brightness_limit=0.2,
                                            contrast_limit=0.2)
        key = jax.random.PRNGKey(7)
        out = np.asarray(fn(key, jnp.asarray(img), jnp.zeros((9, 2)))[0])
        k1, k2 = jax.random.split(key)
        alpha = 1.0 + float(jax.random.uniform(k1, minval=-0.2, maxval=0.2))
        beta = float(jax.random.uniform(k2, minval=-0.2, maxval=0.2)) * 255.0
        np.testing.assert_allclose(out, np.clip(img * alpha + beta, 0, 255),
                                   atol=1e-3)

    def test_color_jitter_identity_at_zero_limits(self):
        from tpudet3d.data.transforms import color_jitter
        img = self._img(8)
        fn, _p = color_jitter(brightness=0., contrast=0., saturation=0.,
                              hue=0.)
        out = np.asarray(fn(jax.random.PRNGKey(0), jnp.asarray(img),
                            jnp.zeros((9, 2)))[0])
        np.testing.assert_allclose(out, img, atol=0.05)

    def test_color_jitter_components_match_torchvision_formulas(self):
        """torchvision adjust_contrast blends with mean(grayscale) (a
        scalar), adjust_saturation with the grayscale image, grayscale =
        ITU-R 601 weights."""
        from tpudet3d.data.transforms import (_cj_contrast, _cj_saturation,
                                              _cj_brightness)
        img = self._img(9)
        key = jax.random.PRNGKey(11)
        f = float(jax.random.uniform(key, minval=0.8, maxval=1.2))
        gray = img @ np.asarray([0.299, 0.587, 0.114], np.float32)
        ref_c = np.clip(img * f + gray.mean() * (1 - f), 0, 255)
        np.testing.assert_allclose(
            np.asarray(_cj_contrast(key, jnp.asarray(img), 0.2)), ref_c,
            atol=1e-2)
        ref_s = np.clip(img * f + gray[..., None] * (1 - f), 0, 255)
        np.testing.assert_allclose(
            np.asarray(_cj_saturation(key, jnp.asarray(img), 0.2)), ref_s,
            atol=1e-2)
        f2 = float(jax.random.uniform(key, minval=0.8, maxval=1.2))
        np.testing.assert_allclose(
            np.asarray(_cj_brightness(key, jnp.asarray(img), 0.2)),
            np.clip(img * f2, 0, 255), atol=1e-3)

    def test_color_jitter_hue_rotation_exact(self):
        """Hue rotation by exactly 1/3 cycle maps pure red to pure green."""
        from tpudet3d.data.transforms import rgb_to_hsv, hsv_to_rgb
        red = jnp.zeros((4, 4, 3)).at[..., 0].set(200.0)
        h, s, v = rgb_to_hsv(red)
        green = np.asarray(hsv_to_rgb(h + 120.0, s, v))
        np.testing.assert_allclose(green[..., 1], 200.0, atol=1e-3)
        np.testing.assert_allclose(green[..., 0], 0.0, atol=1e-3)
