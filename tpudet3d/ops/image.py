"""Device-side image ops: fused crop-resize-normalize, bilinear resize.

These replace the per-detection host-side cv2 crop+resize of the reference
deployment (torchdet3d/utils/ie_wrappers.py:18-21,154-158): all detected
boxes are cropped from the frame and resized in one batched XLA gather, so
the detector → regressor hand-off never leaves HBM (BASELINE.json north
star).
"""

from functools import partial

import jax
import jax.numpy as jnp

__all__ = ['crop_and_resize', 'crop_and_resize_gather',
           'resize_bilinear', 'normalize_images']


def resize_bilinear(img, out_hw, dtype=jnp.float32):
    """[..., H, W, C] → [..., h, w, C] bilinear (align like cv2/jax.image).

    ``dtype`` is the compute/output dtype: the serving path resizes 720p
    frames in bfloat16 (integer pixel values ≤255 are exact in bf16; the
    interpolation rounds at ~0.5 gray-level, below JPEG noise) to halve
    the HBM traffic of the largest intermediate (measured: the f32 width
    pass was 15% of the fused serving program, profile_serving.py)."""
    out_shape = img.shape[:-3] + (out_hw[0], out_hw[1], img.shape[-1])
    return jax.image.resize(img.astype(dtype), out_shape, 'bilinear')


def normalize_images(img, mean, std, max_pixel_value=255.0):
    mean = jnp.asarray(mean, jnp.float32) * max_pixel_value
    std = jnp.asarray(std, jnp.float32) * max_pixel_value
    return (img.astype(jnp.float32) - mean) / std


def _bilinear_sample(img, sy, sx):
    """img [H,W,C]; sy/sx [h,w] float source coords → [h,w,C]."""
    h_in, w_in = img.shape[0], img.shape[1]
    y0 = jnp.floor(sy)
    x0 = jnp.floor(sx)
    wy = sy - y0
    wx = sx - x0
    y0 = jnp.clip(y0.astype(jnp.int32), 0, h_in - 1)
    x0 = jnp.clip(x0.astype(jnp.int32), 0, w_in - 1)
    y1 = jnp.clip(y0 + 1, 0, h_in - 1)
    x1 = jnp.clip(x0 + 1, 0, w_in - 1)
    p00 = img[y0, x0]
    p01 = img[y0, x1]
    p10 = img[y1, x0]
    p11 = img[y1, x1]
    wy = wy[..., None]
    wx = wx[..., None]
    return (p00 * (1 - wy) * (1 - wx) + p01 * (1 - wy) * wx +
            p10 * wy * (1 - wx) + p11 * wy * wx)


@partial(jax.jit, static_argnames=('out_hw',))
def crop_and_resize_gather(image, boxes, out_hw=(224, 224)):
    """Gather-based batched crop+resize (reference implementation for
    correctness tests; the MXU variant below is the production path)."""
    image = image.astype(jnp.float32)
    h_out, w_out = out_hw

    def one(box):
        x0, y0, x1, y1 = box[0], box[1], box[2], box[3]
        bw = jnp.maximum(x1 - x0, 1.0)
        bh = jnp.maximum(y1 - y0, 1.0)
        ys = (jnp.arange(h_out, dtype=jnp.float32) + 0.5) * (bh / h_out) - 0.5 + y0
        xs = (jnp.arange(w_out, dtype=jnp.float32) + 0.5) * (bw / w_out) - 0.5 + x0
        sy = jnp.broadcast_to(ys[:, None], (h_out, w_out))
        sx = jnp.broadcast_to(xs[None, :], (h_out, w_out))
        return _bilinear_sample(image, sy, sx)

    return jax.vmap(one)(boxes.astype(jnp.float32))


def _interp_matrix(src_coords, size):
    """[O] float source coords → [O, size] bilinear interpolation matrix
    (≤2 nonzeros per row, clamped at the borders)."""
    grid = jnp.arange(size, dtype=jnp.float32)[None, :]            # [1, S]
    src = jnp.clip(src_coords, 0.0, size - 1.0)[:, None]           # [O, 1]
    return jnp.clip(1.0 - jnp.abs(grid - src), 0.0, 1.0)           # [O, S]


@partial(jax.jit, static_argnames=('out_hw', 'compute_dtype'))
def crop_and_resize(image, boxes, out_hw=(224, 224),
                    compute_dtype=jnp.bfloat16):
    """MXU-based batched crop+resize: image [H,W,3], boxes [K,4] xyxy px →
    [K,h,w,3] float32.

    Bilinear resampling is separable, so each crop is two dense matmuls
    (rows: [h,H]x[H,W,3]; cols: [w,W]) — the interpolation matrices are
    built on the VPU from the box coordinates and the contractions ride the
    MXU.  ~100x faster than the gather formulation on TPU for 720p frames
    (gathers serialize; matmuls tile).  cv2-compatible pixel-center
    sampling: src = (dst+0.5)*scale − 0.5.
    """
    h_in, w_in = image.shape[0], image.shape[1]
    h_out, w_out = out_hw
    image = image.astype(compute_dtype)
    # Contract the axis that yields the SMALLER intermediate first: the
    # half-resized [K, ·, ·, 3] tensor is the largest HBM round trip of the
    # serving program's crop stage (height-first is K·h_out·W·3, width-first
    # is K·H·w_out·3 — for landscape frames 480×640/720×1280 → 224² crops,
    # width-first is 25–45% smaller).  It is also STORED in the compute
    # dtype (accumulation stays f32 via preferred_element_type): the
    # unconditional-f32 store doubled the dominant intermediate's bytes,
    # and bf16 rounding of a half-interpolated pixel is ~0.5 gray-level —
    # below the crops' JPEG/interpolation noise (VERDICT r4 item 6).
    height_first = h_out * w_in <= h_in * w_out

    def one(box):
        x0, y0, x1, y1 = box[0], box[1], box[2], box[3]
        bw = jnp.maximum(x1 - x0, 1.0)
        bh = jnp.maximum(y1 - y0, 1.0)
        ys = (jnp.arange(h_out, dtype=jnp.float32) + 0.5) * (bh / h_out) - 0.5 + y0
        xs = (jnp.arange(w_out, dtype=jnp.float32) + 0.5) * (bw / w_out) - 0.5 + x0
        wy = _interp_matrix(ys, h_in).astype(compute_dtype)        # [h, H]
        wx = _interp_matrix(xs, w_in).astype(compute_dtype)        # [w, W]
        if height_first:
            rows = jnp.einsum('ph,hwc->pwc', wy, image,
                              preferred_element_type=jnp.float32)
            rows = rows.astype(compute_dtype)                      # [h, W, 3]
            out = jnp.einsum('qw,pwc->pqc', wx, rows,
                             preferred_element_type=jnp.float32)
        else:
            cols = jnp.einsum('qw,hwc->hqc', wx, image,
                              preferred_element_type=jnp.float32)
            cols = cols.astype(compute_dtype)                      # [H, w, 3]
            out = jnp.einsum('ph,hqc->pqc', wy, cols,
                             preferred_element_type=jnp.float32)
        # accumulate in f32 (preferred_element_type), store crops in the
        # compute dtype: the [K,224,224,3] intermediate is read once by
        # the regressor stem, and halving it saves HBM round trips
        return out.astype(compute_dtype) if compute_dtype != jnp.float32 \
            else out

    return jax.vmap(one)(boxes.astype(jnp.float32))
