"""EPnP lifting tests (mirrors reference tests/test_geometry.py:25-40, with
extra batched-vs-host parity and jit checks)."""

import numpy as np
import jax
import jax.numpy as jnp

from tpudet3d.ops import (lift_2d, lift_2d_batched, get_default_camera_matrix,
                          convert_camera_matrix_2_ndc, project_3d_points,
                          convert_2d_to_ndc, iou_oriented_boxes, iou_single_host)


TEST_KPS = np.array([[0.47714591, 0.47491544],
                     [0.73884577, 0.39749265],
                     [0.18508956, 0.40002537],
                     [0.74114597, 0.48664019],
                     [0.18273196, 0.48833901],
                     [0.64639187, 0.46719882],
                     [0.32766378, 0.46827659],
                     [0.64726073, 0.51853681],
                     [0.32699507, 0.51933688]])
EPS = 1e-5
IOU_THR = 0.5


class TestCasesGeometry:

    def test_reprojection_error(self):
        kps_3d = lift_2d([TEST_KPS], portrait=True)[0]
        reproj = project_3d_points(
            kps_3d, convert_camera_matrix_2_ndc(get_default_camera_matrix()))
        test_kps_ndc = convert_2d_to_ndc(TEST_KPS, portrait=True)
        assert np.all(np.linalg.norm(test_kps_ndc - reproj, axis=1) < EPS)

    def test_batched_matches_host(self):
        rng = np.random.RandomState(0)
        batch = np.clip(TEST_KPS[None] + 0.05 * rng.rand(16, 9, 2), 0, 1)
        host = np.stack(lift_2d(list(batch), portrait=True))
        dev = np.asarray(lift_2d_batched(jnp.asarray(batch), portrait=True))
        # both are defined up to scale with fixed eigenvector normalization;
        # eigh conventions agree on sign because of the z<0 flip.  float32
        # eigenvectors of the near-null smallest eigenvalue limit precision
        # (~5e-3 NDC, measured).
        assert np.allclose(host, dev, atol=2e-2)

    def test_batched_reprojection_under_jit(self):
        # clean keypoints (an exact box projection): the f32 device lift
        # must reproject to within its numeric floor
        batch = np.repeat(TEST_KPS[None], 8, axis=0)
        lifted = jax.jit(lambda k: lift_2d_batched(k, portrait=True))(
            jnp.asarray(batch, jnp.float32))
        cam = convert_camera_matrix_2_ndc(get_default_camera_matrix())
        reproj = project_3d_points(np.asarray(lifted, np.float64), cam)
        ndc = np.asarray(convert_2d_to_ndc(batch, portrait=True))
        assert np.all(np.linalg.norm(ndc - reproj, axis=-1) < 1e-2)

    def test_3d_iou_stability(self):
        np.random.seed(10)
        noisy = np.clip(TEST_KPS + 0.01 * np.random.rand(*TEST_KPS.shape), 0, 1)
        lifted = lift_2d([TEST_KPS, noisy], portrait=True)
        iou = float(iou_oriented_boxes(jnp.asarray(lifted[0]), jnp.asarray(lifted[1])))
        assert iou > IOU_THR

    def test_iou_identity(self):
        lifted = lift_2d([TEST_KPS], portrait=True)[0]
        iou = float(iou_oriented_boxes(jnp.asarray(lifted), jnp.asarray(lifted)))
        assert abs(iou - 1.0) < 1e-3

    def test_iou_device_matches_qhull_host(self):
        """Cross-check the static-shape clipping kernel against an
        independent scipy halfspace-intersection implementation (the vendor
        algorithm, SURVEY.md §2.9)."""
        rng = np.random.RandomState(3)
        for _ in range(4):
            noisy = np.clip(TEST_KPS + 0.05 * rng.rand(*TEST_KPS.shape), 0, 1)
            lifted = lift_2d([TEST_KPS, noisy], portrait=True)
            dev = float(iou_oriented_boxes(jnp.asarray(lifted[0]),
                                           jnp.asarray(lifted[1])))
            host = iou_single_host(lifted[0], lifted[1])
            assert abs(dev - host) < 1e-2, (dev, host)

    def test_iou_disjoint_boxes(self):
        lifted = lift_2d([TEST_KPS], portrait=True)[0]
        shifted = lifted + np.array([10.0, 0.0, 0.0])
        iou = float(iou_oriented_boxes(jnp.asarray(lifted), jnp.asarray(shifted)))
        assert iou == 0.0
