"""Oriented 3D bounding-box IoU as a batched device kernel.

The reference computes 3D IoU per-sample on the host via the Objectron
vendor package (``objectron.dataset.iou``: qhull halfspace intersection +
ConvexHull volume), called from torchdet3d/evaluation/metrics.py:70-89 —
the dominant cost of validation (SURVEY.md §3.2).

Here the intersection volume is computed *exactly* and *batched on device*
with static shapes:

1. Each box (9 Objectron keypoints: center + 8 corners in binary ±e1±e2±e3
   order) is decomposed into a center + 3 half-axis vectors.  EPnP-lifted
   boxes are exact parallelepipeds (vertices are affine in the control
   points), so the 6 face planes are exact.
2. The boundary of ``B1 ∩ B2`` is the union of B1's faces clipped to B2 and
   B2's faces clipped to B1.  Each quad face is clipped by the other box's 6
   halfspaces with a fixed-size Sutherland–Hodgman pass (a convex polygon
   gains at most one vertex per plane → max 10, buffer 12).
3. Volume via the divergence theorem: fan-triangulate each outward-oriented
   clipped polygon and sum signed tetrahedron volumes w.r.t. the origin.

Everything is jit/vmap friendly — no host sync, no dynamic shapes.
"""

import numpy as np
import jax
import jax.numpy as jnp

__all__ = ['box_axes', 'box_volume', 'iou_oriented_boxes',
           'pairwise_iou_oriented_boxes', 'iou_single_host']

_MAXV = 12  # vertex buffer per clipped face polygon (quad + 6 clips ≤ 10)

# Face corner indices (into the 8-corner array, binary order: bit2=e1, bit1=e2,
# bit0=e3), ordered CCW viewed from outside for a right-handed (e1,e2,e3).
_FACES = np.array([
    [4, 6, 7, 5],   # +e1
    [0, 1, 3, 2],   # -e1
    [2, 3, 7, 6],   # +e2
    [0, 4, 5, 1],   # -e2
    [1, 5, 7, 3],   # +e3
    [0, 2, 6, 4],   # -e3
], dtype=np.int32)


def box_axes(keypoints):
    """center [.,3], half-axes [.,3,3] from Objectron 9-keypoint boxes [.,9,2+1]."""
    corners = keypoints[..., 1:9, :]
    center = jnp.mean(corners, axis=-2)
    # half-axis i = mean(corners with bit_i set) - center
    e1 = jnp.mean(corners[..., 4:8, :], axis=-2) - center
    e2 = jnp.mean(corners[..., jnp.array([2, 3, 6, 7]), :], axis=-2) - center
    e3 = jnp.mean(corners[..., jnp.array([1, 3, 5, 7]), :], axis=-2) - center
    return center, jnp.stack([e1, e2, e3], axis=-2)


def box_volume(axes):
    """Unsigned volume of the parallelepiped: 8*|det(e1,e2,e3)|."""
    return 8.0 * jnp.abs(jnp.linalg.det(axes))


def _box_halfspaces(center, axes):
    """Outward halfspaces A x <= b ([6,3], [6]) of a parallelepiped."""
    e1, e2, e3 = axes[..., 0, :], axes[..., 1, :], axes[..., 2, :]
    n1 = jnp.cross(e2, e3)
    n2 = jnp.cross(e3, e1)
    n3 = jnp.cross(e1, e2)
    # orient each normal along its own axis
    n1 = n1 * jnp.sign(jnp.sum(n1 * e1, axis=-1, keepdims=True))
    n2 = n2 * jnp.sign(jnp.sum(n2 * e2, axis=-1, keepdims=True))
    n3 = n3 * jnp.sign(jnp.sum(n3 * e3, axis=-1, keepdims=True))
    ns = jnp.stack([n1, -n1, n2, -n2, n3, -n3], axis=-2)          # [..., 6, 3]
    face_pts = jnp.stack([center + e1, center - e1,
                          center + e2, center - e2,
                          center + e3, center - e3], axis=-2)      # [..., 6, 3]
    b = jnp.sum(ns * face_pts, axis=-1)                            # [..., 6]
    return ns, b


def _clip_polygon_by_plane(poly, count, normal, offset, eps):
    """One Sutherland–Hodgman pass with static shapes.

    poly: [V,3] buffer, count: valid-vertex count (traced scalar),
    normal/offset: plane (inside = n·x <= offset + eps).

    ``eps`` is signed: the caller clips box1's faces with +tol (keep pieces
    lying ON box2's boundary) and box2's faces with -tol (drop them), so
    coincident boundary pieces — e.g. identical boxes, axis-aligned touching
    faces — are counted exactly once in the divergence-theorem volume.
    """
    V = poly.shape[0]
    idx = jnp.arange(V)
    valid = idx < count
    d = poly @ normal - offset                                     # [V]
    inside = d <= eps
    nxt = jnp.where(idx + 1 >= count, 0, idx + 1)
    d_next = d[nxt]
    inside_next = d_next <= eps
    crossing = (inside != inside_next) & valid
    inside = inside & valid
    denom = d - d_next
    t = jnp.where(jnp.abs(denom) > 1e-12, d / jnp.where(denom == 0, 1.0, denom), 0.0)
    inter = poly + t[:, None] * (poly[nxt] - poly)                 # [V,3]

    emit_vertex = inside                                           # emit p_i if inside
    emit_cross = crossing
    n_emit = emit_vertex.astype(jnp.int32) + emit_cross.astype(jnp.int32)
    start = jnp.cumsum(n_emit) - n_emit                            # prefix offsets
    new_count = jnp.sum(n_emit)

    out = jnp.zeros_like(poly)
    vert_slot = jnp.where(emit_vertex, start, V)                   # V = drop
    cross_slot = jnp.where(emit_cross, start + emit_vertex.astype(jnp.int32), V)
    out = out.at[vert_slot].set(poly, mode='drop')
    out = out.at[cross_slot].set(inter, mode='drop')
    return out, new_count


def _clip_face_volume(face_poly, handedness, planes_a, planes_b, first_pass):
    """Clip one outward-oriented quad by 6 halfspaces; signed volume contribution.

    Coincident-plane tie-breaking (so ∂A ∩ ∂B pieces are counted exactly
    once, and exactly zero times when the boxes merely touch):
      * pass 1 (A's faces vs B's planes): keep a face lying ON a B plane
        only when the normals point the same way (overlapping boxes);
        drop when they oppose (touching boxes → empty intersection);
      * pass 2 (B's faces vs A's planes): always drop coincident pieces —
        pass 1 already counted them.
    """
    poly = jnp.zeros((_MAXV, 3), dtype=face_poly.dtype)
    poly = poly.at[:4].set(face_poly)
    count = jnp.int32(4)
    face_n = jnp.cross(face_poly[1] - face_poly[0],
                       face_poly[2] - face_poly[0]) * handedness

    def body(i, carry):
        poly, count = carry
        # relative tolerance; normals are unnormalized so scale by |offset|
        tol = 1e-5 * (1.0 + jnp.abs(planes_b[i]))
        if first_pass:
            eps = tol * jnp.sign(jnp.sum(face_n * planes_a[i]))
        else:
            eps = -tol
        poly, count = _clip_polygon_by_plane(poly, count, planes_a[i],
                                             planes_b[i], eps)
        return poly, count

    poly, count = jax.lax.fori_loop(0, planes_a.shape[0], body, (poly, count))

    # fan triangulation: tets (0, p0, p_i, p_{i+1}) for i in [1, count-2]
    idx = jnp.arange(_MAXV)
    tri_valid = (idx >= 1) & (idx < count - 1)
    p0 = poly[0]
    a = poly
    b = poly[jnp.minimum(idx + 1, _MAXV - 1)]
    dets = jnp.einsum('i,vi->v', p0, jnp.cross(a, b))
    vol = jnp.sum(jnp.where(tri_valid, dets, 0.0)) / 6.0
    return vol * handedness


def iou_oriented_boxes(kp1, kp2):
    """Exact IoU of two batches of oriented parallelepipeds.

    kp1, kp2: [..., 9, 3] Objectron keypoint boxes.  Returns [...] IoU in
    [0, 1]; non-finite/degenerate inputs yield 0 (matching the reference's
    per-sample qhull-error tolerance, metrics.py:81-86).
    """
    kp1 = jnp.asarray(kp1, dtype=jnp.float32)
    kp2 = jnp.asarray(kp2, dtype=jnp.float32)
    c1, ax1 = box_axes(kp1)
    c2, ax2 = box_axes(kp2)
    v1 = box_volume(ax1)
    v2 = box_volume(ax2)
    h1 = jnp.sign(jnp.linalg.det(ax1))
    h2 = jnp.sign(jnp.linalg.det(ax2))
    A1, b1 = _box_halfspaces(c1, ax1)
    A2, b2 = _box_halfspaces(c2, ax2)

    corners1 = kp1[..., 1:9, :]
    corners2 = kp2[..., 1:9, :]
    faces = jnp.asarray(_FACES)

    def one_pair(corners_a, hand_a, planes_n, planes_o, first_pass):
        polys = corners_a[faces]                                   # [6, 4, 3]
        vols = jax.vmap(lambda p: _clip_face_volume(
            p, hand_a, planes_n, planes_o, first_pass))(polys)
        return jnp.sum(vols)

    def pair_fn(c1_, h1_, A2_, b2_, c2_, h2_, A1_, b1_):
        vi = (one_pair(c1_, h1_, A2_, b2_, True) +
              one_pair(c2_, h2_, A1_, b1_, False))
        return vi

    batch_shape = kp1.shape[:-2]
    flat = lambda x: x.reshape((-1,) + x.shape[len(batch_shape):])
    vi = jax.vmap(pair_fn)(flat(corners1), flat(h1), flat(A2), flat(b2),
                           flat(corners2), flat(h2), flat(A1), flat(b1))
    vi = vi.reshape(batch_shape)
    vi = jnp.clip(vi, 0.0, jnp.minimum(v1, v2))
    union = v1 + v2 - vi
    iou = jnp.where(union > 1e-12, vi / union, 0.0)
    iou = jnp.where(jnp.isfinite(iou), iou, 0.0)
    return jnp.clip(iou, 0.0, 1.0)


def pairwise_iou_oriented_boxes(kps_a, kps_b):
    """[N,9,3] x [M,9,3] → [N,M] IoU matrix (vmapped cross product)."""
    return jax.vmap(lambda a: jax.vmap(lambda b: iou_oriented_boxes(a, b))(kps_b))(kps_a)


def iou_single_host(kp1, kp2):
    """Independent host-side exact IoU via scipy halfspace intersection —
    mirrors the vendor algorithm (qhull) for parity tests; NOT used in the
    hot path."""
    import scipy.spatial
    from scipy.optimize import linprog

    def halfspaces(kp):
        corners = np.asarray(kp, dtype=np.float64)[1:9]
        center = corners.mean(0)
        e1 = corners[4:8].mean(0) - center
        e2 = corners[[2, 3, 6, 7]].mean(0) - center
        e3 = corners[[1, 3, 5, 7]].mean(0) - center
        ns, bs = [], []
        for e, (u, v) in zip((e1, e2, e3), ((e2, e3), (e3, e1), (e1, e2))):
            n = np.cross(u, v)
            n *= np.sign(n @ e)
            ns += [n, -n]
            bs += [n @ (center + e), -n @ (center - e)]
        return np.array(ns), np.array(bs)

    def volume(kp):
        corners = np.asarray(kp, dtype=np.float64)[1:9]
        center = corners.mean(0)
        e1 = corners[4:8].mean(0) - center
        e2 = corners[[2, 3, 6, 7]].mean(0) - center
        e3 = corners[[1, 3, 5, 7]].mean(0) - center
        return 8.0 * abs(np.linalg.det(np.stack([e1, e2, e3])))

    A1, b1 = halfspaces(kp1)
    A2, b2 = halfspaces(kp2)
    A = np.vstack([A1, A2])
    b = np.concatenate([b1, b2])
    # Chebyshev center as the interior point for HalfspaceIntersection
    norms = np.linalg.norm(A, axis=1, keepdims=True)
    res = linprog(c=np.r_[np.zeros(3), -1.0],
                  A_ub=np.hstack([A, norms]), b_ub=b,
                  bounds=[(None, None)] * 3 + [(0, None)], method='highs')
    if not res.success or res.x[3] < 1e-12:
        return 0.0
    interior = res.x[:3]
    try:
        hs = scipy.spatial.HalfspaceIntersection(
            np.hstack([A, -b[:, None]]), interior)
        hull = scipy.spatial.ConvexHull(hs.intersections)
        vi = hull.volume
    except Exception:  # qhull errors → 0, like the reference
        return 0.0
    v1, v2 = volume(kp1), volume(kp2)
    union = v1 + v2 - vi
    return float(vi / union) if union > 0 else 0.0
