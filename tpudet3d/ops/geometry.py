"""EPnP 2D→3D lifting and camera geometry, TPU-first.

Re-derivation of the reference math (torchdet3d/utils/geometry.py:6-108)
with one structural change: the reference lifts one keypoint set at a time
with Python loops building a 16x12 system and LAPACK ``eigh`` on the host;
here the whole batch is lifted in a single jitted computation — the M matrix
is assembled with einsums over a constant sparsity pattern and the 12x12
eigendecomposition runs batched on device (``jnp.linalg.eigh`` is vmappable
and maps onto XLA's batched eigensolver).

Conventions (Objectron): keypoint 0 is the box center; keypoints 1-8 are the
8 box vertices; ``__epnp_alpha__`` expresses vertices as combinations of 4
EPnP control points (center + 3 half-axis endpoints).
"""

import numpy as np
import jax.numpy as jnp

__all__ = [
    'EPNP_ALPHA', 'get_default_camera_matrix', 'project_3d_points',
    'convert_camera_matrix_2_ndc', 'convert_2d_to_ndc',
    'lift_2d', 'lift_2d_batched',
]

# Control-point alphas for vertices 1..8 (reference geometry.py:6-13).
EPNP_ALPHA = np.array([[4, -1, -1, -1],
                       [2, -1, -1, 1],
                       [2, -1, 1, -1],
                       [0, -1, 1, 1],
                       [2, 1, -1, -1],
                       [0, 1, -1, 1],
                       [0, 1, 1, -1],
                       [-2, 1, 1, 1]], dtype=np.float64)


def get_default_camera_matrix():
    """Normalized pinhole camera (reference geometry.py:16-19)."""
    return np.array([[1., 0., 0.5],
                     [0., 1., 0.5],
                     [0., 0., 1.]])


def project_3d_points(points, camera_matrix):
    """Pinhole projection with Objectron's -z convention
    (reference geometry.py:22-26).  Works for np or jnp inputs."""
    xp = jnp if isinstance(points, jnp.ndarray) else np
    projection = xp.matmul(points, camera_matrix.T)
    projection = projection / (-projection[..., 2:3])
    return projection[..., :2]


def convert_camera_matrix_2_ndc(matrix, img_shape=(1, 1)):
    """Camera matrix in pixels → NDC (reference geometry.py:29-37)."""
    ndc_mat = np.array(matrix, dtype=np.float64, copy=True)
    ndc_mat[0, 0] *= 2.0 / img_shape[0]
    ndc_mat[1, 1] *= 2.0 / img_shape[1]
    ndc_mat[0, 2] = -ndc_mat[0, 2] * 2.0 / img_shape[0] + 1.0
    ndc_mat[1, 2] = -ndc_mat[1, 2] * 2.0 / img_shape[1] + 1.0
    return ndc_mat


def convert_2d_to_ndc(points, portrait=False):
    """[0,1] screen coords → [-1,1] NDC (reference geometry.py:40-48)."""
    xp = jnp if isinstance(points, jnp.ndarray) else np
    x, y = points[..., 0], points[..., 1]
    if portrait:
        u = y * 2 - 1
        v = x * 2 - 1
    else:
        u = x * 2 - 1
        v = 1 - y * 2
    return xp.stack([u, v], axis=-1)


def _build_m(uv, fx, fy, cx, cy):
    """Assemble the EPnP system for a batch.

    uv: [..., 8, 2] NDC coords of vertices 1..8.
    Returns M: [..., 16, 12].  Row 2i   : fx*alpha at x-slots, (cx+u)*alpha at z-slots.
                 Row 2i+1 : fy*alpha at y-slots, (cy+v)*alpha at z-slots.
    (reference geometry.py:68-88, vectorized)
    """
    alpha = jnp.asarray(EPNP_ALPHA, dtype=uv.dtype)          # [8, 4]
    u = uv[..., 0]                                            # [..., 8]
    v = uv[..., 1]
    # x-slot coefficient for even rows: fx * alpha          -> [..., 8, 4]
    ex = jnp.broadcast_to(alpha * fx, u.shape + (4,)).reshape(u.shape + (4,))
    # z-slot coefficient for even rows: (cx + u) * alpha    -> [..., 8, 4]
    ez = (cx + u)[..., None] * alpha
    # y-slot coefficient for odd rows: fy * alpha
    oy = jnp.broadcast_to(alpha * fy, u.shape + (4,)).reshape(u.shape + (4,))
    # z-slot coefficient for odd rows: (cy + v) * alpha
    oz = (cy + v)[..., None] * alpha

    zero = jnp.zeros_like(ex)
    # even rows: [x, y, z] slots per control point -> [..., 8, 4, 3]
    even = jnp.stack([ex, zero, ez], axis=-1)
    odd = jnp.stack([zero, oy, oz], axis=-1)
    rows = jnp.stack([even, odd], axis=-3)                   # [..., 8, 2, 4, 3]
    m = rows.reshape(rows.shape[:-4] + (16, 12))
    return m


def lift_2d_batched(keypoints, camera_matrix=None, portrait=False):
    """Batched EPnP lift: [..., 9, 2] normalized 2D keypoints → [..., 9, 3]
    camera-space 3D points up to scale (z < 0 in front of the camera).

    Matches the reference per-sample algorithm (geometry.py:51-108) to float
    tolerance; jit/vmap/pjit friendly (static shapes, no host sync).
    """
    keypoints = jnp.asarray(keypoints)
    dtype = jnp.float32 if keypoints.dtype != jnp.float64 else jnp.float64
    keypoints = keypoints.astype(dtype)
    if camera_matrix is None:
        camera_matrix = get_default_camera_matrix()
    ndc_cam = convert_camera_matrix_2_ndc(np.asarray(camera_matrix))
    fx = dtype(ndc_cam[0, 0])
    fy = dtype(ndc_cam[1, 1])
    cx = dtype(ndc_cam[0, 2])
    cy = dtype(ndc_cam[1, 2])

    uv = convert_2d_to_ndc(keypoints[..., 1:9, :], portrait=portrait)
    m = _build_m(uv, fx, fy, cx, cy)                          # [..., 16, 12]
    mt_m = jnp.einsum('...ki,...kj->...ij', m, m)             # [..., 12, 12]
    _, eigvecs = jnp.linalg.eigh(mt_m)
    control = eigvecs[..., :, 0].reshape(mt_m.shape[:-2] + (4, 3))
    # all 3D points must sit in front of the camera (z < 0)
    sign = jnp.where(control[..., 0, 2] > 0, -1.0, 1.0).astype(dtype)
    control = control * sign[..., None, None]
    alpha = jnp.asarray(EPNP_ALPHA, dtype=dtype)
    vertices = jnp.einsum('va,...ac->...vc', alpha, control)  # [..., 8, 3]
    center = control[..., 0:1, :]
    return jnp.concatenate([center, vertices], axis=-2)


def lift_2d(keypoint_sets, camera_matrix=None, portrait=False):
    """Reference-compatible list API (geometry.py:51-108): list of [9,2]
    numpy arrays in, list of [9,3] numpy arrays out."""
    if camera_matrix is None:
        camera_matrix = get_default_camera_matrix()
    batch = np.stack([np.asarray(k, dtype=np.float64) for k in keypoint_sets])
    lifted = _lift_host(batch, np.asarray(camera_matrix), portrait)
    return [lifted[i] for i in range(lifted.shape[0])]


def _lift_host(batch, camera_matrix, portrait):
    """float64 host path for exact-parity checks (numpy eigh)."""
    ndc_cam = convert_camera_matrix_2_ndc(camera_matrix)
    fx, fy = ndc_cam[0, 0], ndc_cam[1, 1]
    cx, cy = ndc_cam[0, 2], ndc_cam[1, 2]
    uv = np.asarray(convert_2d_to_ndc(batch[:, 1:9, :], portrait=portrait))
    alpha = EPNP_ALPHA
    bs = batch.shape[0]
    m = np.zeros((bs, 16, 12))
    ex = np.broadcast_to(alpha * fx, (bs, 8, 4))
    oy = np.broadcast_to(alpha * fy, (bs, 8, 4))
    ez = (cx + uv[..., 0])[..., None] * alpha
    oz = (cy + uv[..., 1])[..., None] * alpha
    zero = np.zeros_like(ez)
    even = np.stack([ex, zero, ez], axis=-1)
    odd = np.stack([zero, oy, oz], axis=-1)
    m = np.stack([even, odd], axis=2).reshape(bs, 16, 12)
    mt_m = np.einsum('bki,bkj->bij', m, m)
    _, eigvecs = np.linalg.eigh(mt_m)
    control = eigvecs[:, :, 0].reshape(bs, 4, 3)
    sign = np.where(control[:, 0, 2] > 0, -1.0, 1.0)
    control = control * sign[:, None, None]
    vertices = np.einsum('va,bac->bvc', alpha, control)
    return np.concatenate([control[:, 0:1, :], vertices], axis=1)
