"""Oriented 3D-box IoU kernel: analytic ground-truth cases.

These exercise exactly the degeneracies the reference's qhull path handles
implicitly (coincident faces, containment, rotation) — SURVEY.md §7 'hard
parts'.
"""

import numpy as np
import jax.numpy as jnp

from tpudet3d.ops.box3d import (iou_oriented_boxes,
                                pairwise_iou_oriented_boxes, box_axes,
                                box_volume)


def box_kps(center, half, rot=np.eye(3)):
    corners = np.array([[sx, sy, sz] for sx in (-1, 1) for sy in (-1, 1)
                        for sz in (-1, 1)], float)
    pts = corners * half @ rot.T + center
    return np.concatenate([[center], pts])


UNIT = box_kps(np.zeros(3), np.array([.5, .5, .5]))


class TestBox3dIoU:

    def test_self(self):
        assert abs(float(iou_oriented_boxes(jnp.asarray(UNIT),
                                            jnp.asarray(UNIT))) - 1.0) < 1e-5

    def test_half_shift(self):
        b = box_kps(np.array([.5, 0, 0]), np.array([.5, .5, .5]))
        iou = float(iou_oriented_boxes(jnp.asarray(UNIT), jnp.asarray(b)))
        assert abs(iou - 1 / 3) < 1e-5

    def test_rot45(self):
        th = np.pi / 4
        rot = np.array([[np.cos(th), -np.sin(th), 0],
                        [np.sin(th), np.cos(th), 0], [0, 0, 1]])
        c = box_kps(np.zeros(3), np.array([.5, .5, .5]), rot)
        inter = 2 * (np.sqrt(2) - 1)
        iou = float(iou_oriented_boxes(jnp.asarray(UNIT), jnp.asarray(c)))
        assert abs(iou - inter / (2 - inter)) < 1e-5

    def test_nested(self):
        d = box_kps(np.zeros(3), np.array([.25, .25, .25]))
        iou = float(iou_oriented_boxes(jnp.asarray(UNIT), jnp.asarray(d)))
        assert abs(iou - 0.125) < 1e-5

    def test_disjoint_and_touching(self):
        far = box_kps(np.array([5., 0, 0]), np.array([.5, .5, .5]))
        assert float(iou_oriented_boxes(jnp.asarray(UNIT), jnp.asarray(far))) == 0.0
        touching = box_kps(np.array([1., 0, 0]), np.array([.5, .5, .5]))
        assert float(iou_oriented_boxes(jnp.asarray(UNIT),
                                        jnp.asarray(touching))) < 1e-4

    def test_volume_and_axes(self):
        _, axes = box_axes(jnp.asarray(UNIT))
        assert abs(float(box_volume(axes)) - 1.0) < 1e-6

    def test_pairwise_shape(self):
        boxes = jnp.asarray(np.stack([UNIT, UNIT + np.array([2., 0, 0])]))
        mat = pairwise_iou_oriented_boxes(boxes, boxes)
        assert mat.shape == (2, 2)
        m = np.asarray(mat)
        assert abs(m[0, 0] - 1) < 1e-5 and abs(m[1, 1] - 1) < 1e-5
        assert m[0, 1] == 0.0 and m[1, 0] == 0.0

    def test_fuzz_vs_qhull(self):
        """Random oriented, anisotropic, offset box pairs vs the independent
        scipy halfspace-intersection implementation."""
        from tpudet3d.ops.box3d import iou_single_host
        import jax
        rng = np.random.RandomState(17)

        def random_box():
            angles = rng.uniform(-np.pi, np.pi, 3)
            cx, sx = np.cos(angles[0]), np.sin(angles[0])
            cy, sy = np.cos(angles[1]), np.sin(angles[1])
            cz, sz = np.cos(angles[2]), np.sin(angles[2])
            rot = (np.array([[1, 0, 0], [0, cx, -sx], [0, sx, cx]]) @
                   np.array([[cy, 0, sy], [0, 1, 0], [-sy, 0, cy]]) @
                   np.array([[cz, -sz, 0], [sz, cz, 0], [0, 0, 1]]))
            half = rng.uniform(0.2, 0.8, 3)
            center = rng.uniform(-0.4, 0.4, 3)
            return box_kps(center, half, rot)

        pairs = [(random_box(), random_box()) for _ in range(24)]
        a = jnp.asarray(np.stack([p[0] for p in pairs]))
        b = jnp.asarray(np.stack([p[1] for p in pairs]))
        dev = np.asarray(iou_oriented_boxes(a, b))
        for i, (b1, b2) in enumerate(pairs):
            host = iou_single_host(b1, b2)
            assert abs(float(dev[i]) - host) < 5e-3, (i, float(dev[i]), host)

    def test_nonfinite_inputs_zero(self):
        bad = UNIT.copy()
        bad[3] = np.nan
        assert float(iou_oriented_boxes(jnp.asarray(bad),
                                        jnp.asarray(UNIT))) == 0.0
