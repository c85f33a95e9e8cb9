"""Device-side, PRNG-keyed augmentations (replaces albumentations).

The reference augments per-sample on host dataloader workers with
albumentations (torchdet3d/utils/transforms.py, builders/loader_builder.py:
38-61).  Here the whole batch is augmented inside the jitted train step:
uint8 images come in, normalized float tensors and [0,1] keypoints come out,
with per-sample ``jax.random`` keys — deterministic, reproducible, fused by
XLA with the first conv.

Registry names and parameters mirror the reference's declarative config
pipelines (configs/default_config.py:31-42) so configs carry over verbatim:
``('random_rotate', dict(angle_limit=10., p=0.4))`` etc.  ``resize`` is
consumed by the host loader (static shapes must be fixed before batching);
``to_tensor`` marks the kp-normalization point (reference transforms.py:
92-114 normalizes keypoints by the resized shape).
"""

import math
from typing import Callable, Dict, Sequence, Tuple

import jax
import jax.numpy as jnp

__all__ = ['build_augmentations', 'TRANSFORMS_REGISTRY', 'apply_pipeline',
           'rgb_to_hsv', 'hsv_to_rgb']

Sample = Tuple[jnp.ndarray, jnp.ndarray]  # (img [H,W,3] f32, kp [9,2] px)


def _affine_warp(img, inv_matrix, fill=0.0):
    """dst(x, y) = src(inv_matrix @ [x, y, 1]); bilinear, zero fill."""
    h, w = img.shape[0], img.shape[1]
    ys = jnp.arange(h, dtype=jnp.float32)
    xs = jnp.arange(w, dtype=jnp.float32)
    gx, gy = jnp.meshgrid(xs, ys)
    sx = inv_matrix[0, 0] * gx + inv_matrix[0, 1] * gy + inv_matrix[0, 2]
    sy = inv_matrix[1, 0] * gx + inv_matrix[1, 1] * gy + inv_matrix[1, 2]
    out = jax.vmap(  # per channel
        lambda c: jax.scipy.ndimage.map_coordinates(
            c, [sy, sx], order=1, mode='constant', cval=fill),
        in_axes=2, out_axes=2)(img)
    return out


def _rotation_matrix(cx, cy, angle_deg, scale):
    """cv2.getRotationMatrix2D semantics (positive angle = CCW)."""
    rad = angle_deg * (math.pi / 180.0)
    a = scale * jnp.cos(rad)
    b = scale * jnp.sin(rad)
    return jnp.array([[a, b, (1 - a) * cx - b * cy],
                      [-b, a, b * cx + (1 - a) * cy],
                      [0.0, 0.0, 1.0]])


def _scale_by_angle(angle_deg, h, w):
    """Auto-scale keeping the rotated frame inside the canvas
    (reference transforms.py:71-78)."""
    rad = angle_deg * (math.pi / 180.0)
    cos = jnp.cos(rad) - 1
    sin = jnp.sin(rad)
    delta_h = w / 2 * cos + h / 2 * sin
    delta_w = w / 2 * sin + h / 2 * cos
    return jnp.maximum(w / (w + 2 * jnp.abs(delta_w)),
                       h / (h + 2 * jnp.abs(delta_h)))


def _apply_affine_kp(kp, matrix):
    return kp @ matrix[:2, :2].T + matrix[:2, 2]


def _maybe(key, p, fn, img, kp):
    do_key, fn_key = jax.random.split(key)
    do = jax.random.uniform(do_key) < p
    new_img, new_kp = fn(fn_key, img, kp)
    return (jnp.where(do, new_img, img), jnp.where(do, new_kp, kp))


# --- individual transforms: factory(kwargs) -> fn(key, img, kp) -> (img, kp)

def convert_color(**_kw):
    def fn(key, img, kp):
        return img[..., ::-1], kp  # BGR → RGB
    return fn, 1.0


def horizontal_flip(p=0.5, **_kw):
    def fn(key, img, kp):
        w = img.shape[1]
        # albumentations flips kp as x -> (w - 1) - x
        return img[:, ::-1, :], kp.at[:, 0].set(w - 1 - kp[:, 0])
    return fn, p


def random_brightness_contrast(brightness_limit=0.2, contrast_limit=0.2,
                               p=0.5, **_kw):
    """albumentations RandomBrightnessContrast, brightness_by_max=True
    (its default): out = clip(img * (1 + U[-c,c]) + U[-b,b] * max_value)."""
    def fn(key, img, kp):
        k1, k2 = jax.random.split(key)
        alpha = 1.0 + jax.random.uniform(k1, minval=-contrast_limit,
                                         maxval=contrast_limit)
        beta = jax.random.uniform(k2, minval=-brightness_limit,
                                  maxval=brightness_limit) * 255.0
        return jnp.clip(img * alpha + beta, 0, 255), kp
    return fn, p


# --- exact RGB↔HSV in cv2 conventions (H in degrees [0,360), S/V in 0..255
# for float input — matching cv2.cvtColor COLOR_RGB2HSV semantics used by
# albumentations' shift_hsv) ------------------------------------------------

def rgb_to_hsv(img):
    """img [...,3] RGB float 0..255 → (h_deg, s, v): h∈[0,360), s,v∈0..255."""
    r, g, b = img[..., 0], img[..., 1], img[..., 2]
    v = jnp.max(img, axis=-1)
    mn = jnp.min(img, axis=-1)
    delta = v - mn
    safe = jnp.where(delta > 0, delta, 1.0)
    h = jnp.where(v == r, (g - b) / safe % 6.0,
                  jnp.where(v == g, (b - r) / safe + 2.0,
                            (r - g) / safe + 4.0)) * 60.0
    h = jnp.where(delta > 0, h, 0.0)
    s = jnp.where(v > 0, delta / jnp.where(v > 0, v, 1.0), 0.0) * 255.0
    return h, s, v


def hsv_to_rgb(h, s, v):
    """Inverse of rgb_to_hsv (cv2 float conventions)."""
    h60 = (h % 360.0) / 60.0
    i = jnp.floor(h60)
    f = h60 - i
    s01 = s / 255.0
    p = v * (1.0 - s01)
    q = v * (1.0 - f * s01)
    t = v * (1.0 - (1.0 - f) * s01)
    i = i.astype(jnp.int32) % 6
    r = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4], [v, q, p, p, t], v)
    g = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4], [t, v, v, q, p], p)
    b = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4], [p, p, t, v, v], q)
    return jnp.stack([r, g, b], axis=-1)


def random_rotate(angle_limit=10.0, p=0.5, **_kw):
    """Rotate with auto-scale (reference RandomRotate, transforms.py:50-89)."""
    def fn(key, img, kp):
        h, w = img.shape[0], img.shape[1]
        angle = jax.random.uniform(key, minval=-angle_limit, maxval=angle_limit)
        scale = _scale_by_angle(angle, float(h), float(w))
        m = _rotation_matrix(w * 0.5, h * 0.5, angle, scale)
        inv = jnp.linalg.inv(m)
        return _affine_warp(img, inv), _apply_affine_kp(kp, m)
    return fn, p


def random_rescale(scale_limit=0.1, p=0.5, **_kw):
    """Scale about the origin like the reference RandomRescale
    (transforms.py:20-47: image scales about center, keypoints about (0,0)
    with getRotationMatrix2D(center=(0,0)))."""
    lo, hi = ((scale_limit[0], scale_limit[1])
              if isinstance(scale_limit, (tuple, list))
              else (-scale_limit, scale_limit))

    def fn(key, img, kp):
        h, w = img.shape[0], img.shape[1]
        scale = 1.0 + jax.random.uniform(key, minval=lo, maxval=hi)
        m_img = _rotation_matrix(w * 0.5, h * 0.5, 0.0, scale)
        m_kp = _rotation_matrix(0.0, 0.0, 0.0, scale)
        return _affine_warp(img, jnp.linalg.inv(m_img)), _apply_affine_kp(kp, m_kp)
    return fn, p


def rgb_shift(r_shift_limit=20, g_shift_limit=20, b_shift_limit=20, p=0.5, **_kw):
    def fn(key, img, kp):
        shifts = jax.random.uniform(
            key, (3,), minval=-1.0, maxval=1.0) * jnp.array(
                [r_shift_limit, g_shift_limit, b_shift_limit], jnp.float32)
        return jnp.clip(img + shifts, 0, 255), kp
    return fn, p


_LUMA = (0.299, 0.587, 0.114)    # ITU-R 601 (torchvision rgb_to_grayscale)


def _cj_brightness(key, img, limit):
    f = jax.random.uniform(key, minval=max(0.0, 1.0 - limit),
                           maxval=1.0 + limit)
    return jnp.clip(img * f, 0, 255)


def _cj_contrast(key, img, limit):
    f = jax.random.uniform(key, minval=max(0.0, 1.0 - limit),
                           maxval=1.0 + limit)
    gray_mean = jnp.mean(img @ jnp.asarray(_LUMA, jnp.float32))
    return jnp.clip(img * f + gray_mean * (1.0 - f), 0, 255)


def _cj_saturation(key, img, limit):
    f = jax.random.uniform(key, minval=max(0.0, 1.0 - limit),
                           maxval=1.0 + limit)
    gray = (img @ jnp.asarray(_LUMA, jnp.float32))[..., None]
    return jnp.clip(img * f + gray * (1.0 - f), 0, 255)


def _cj_hue(key, img, limit):
    f = jax.random.uniform(key, minval=-limit, maxval=limit)
    h, s, v = rgb_to_hsv(img)
    return jnp.clip(hsv_to_rgb(h + f * 360.0, s, v), 0, 255)


def color_jitter(brightness=0.2, contrast=0.2, saturation=0.2, hue=0.2,
                 p=0.5, **_kw):
    """torchvision-exact ColorJitter (albumentations' ColorJitter documents
    itself as matching torchvision): brightness/contrast/saturation blend
    with ITU-R 601 grayscale, hue is a true HSV hue rotation by U[-hue,hue]
    of a full cycle, and the four ops are applied in RANDOM ORDER."""
    import itertools
    perms = list(itertools.permutations(range(4)))

    def fn(key, img, kp):
        k_perm, kb, kc, ks, kh = jax.random.split(key, 5)
        ops = [lambda im: _cj_brightness(kb, im, brightness),
               lambda im: _cj_contrast(kc, im, contrast),
               lambda im: _cj_saturation(ks, im, saturation),
               lambda im: _cj_hue(kh, im, hue)]

        def make_branch(perm):
            def branch(im):
                for j in perm:
                    im = ops[j](im)
                return im
            return branch

        idx = jax.random.randint(k_perm, (), 0, len(perms))
        img = jax.lax.switch(idx, [make_branch(pm) for pm in perms], img)
        return img, kp
    return fn, p


def hue_saturation_value(hue_shift_limit=20, sat_shift_limit=30,
                         val_shift_limit=20, p=0.5, **_kw):
    """albumentations HueSaturationValue, exact formula: RGB→HSV (cv2
    conventions), hue + U[-h,h] in cv2 uint8-H units (1 unit = 2°) modulo
    the hue circle, sat/val + U[-lim,lim] with clipping, HSV→RGB."""
    def fn(key, img, kp):
        k1, k2, k3 = jax.random.split(key, 3)
        hue_shift = jax.random.uniform(k1, minval=-hue_shift_limit,
                                       maxval=hue_shift_limit)
        sat_shift = jax.random.uniform(k2, minval=-sat_shift_limit,
                                       maxval=sat_shift_limit)
        val_shift = jax.random.uniform(k3, minval=-val_shift_limit,
                                       maxval=val_shift_limit)
        h, s, v = rgb_to_hsv(img)
        h = (h + hue_shift * 2.0) % 360.0     # cv2 uint8 H unit = 2 degrees
        s = jnp.clip(s + sat_shift, 0, 255)
        v = jnp.clip(v + val_shift, 0, 255)
        return jnp.clip(hsv_to_rgb(h, s, v), 0, 255), kp
    return fn, p


def _mean_blur(img, k):
    """cv2.blur-exact k×k mean filter: BORDER_REFLECT_101 padding
    (np.pad mode='reflect'), then VALID conv."""
    pad = k // 2
    x = jnp.pad(img, ((pad, pad), (pad, pad), (0, 0)), mode='reflect')
    kernel = jnp.full((1, 1, k, k), 1.0 / (k * k), x.dtype)
    y = jax.lax.conv_general_dilated(x.transpose(2, 0, 1)[:, None], kernel,
                                     (1, 1), 'VALID')
    return y[:, 0].transpose(1, 2, 0)


def blur(blur_limit=5, p=0.5, **_kw):
    """albumentations Blur: kernel size sampled from the odd values in
    [3, blur_limit], cv2.blur (mean filter, reflect-101 borders)."""
    sizes = list(range(3, int(blur_limit) + 1, 2)) or [3]

    def fn(key, img, kp):
        idx = jax.random.randint(key, (), 0, len(sizes))
        img = jax.lax.switch(
            idx, [(lambda k_: lambda im: _mean_blur(im, k_))(k) for k in sizes],
            img)
        return img, kp
    return fn, p


def normalize(mean=(0.5931, 0.4690, 0.4229), std=(0.2471, 0.2214, 0.2157),
              max_pixel_value=255.0, **_kw):
    mean_arr = jnp.asarray(mean, jnp.float32) * max_pixel_value
    std_arr = jnp.asarray(std, jnp.float32) * max_pixel_value

    def fn(key, img, kp):
        return (img - mean_arr) / std_arr, kp
    return fn, 1.0


def to_tensor(img_shape=None, **_kw):
    """Normalize keypoints to [0,1] by the (resized) image shape
    (reference transforms.py:92-114).  Images stay NHWC for TPU."""
    def fn(key, img, kp):
        h, w = img.shape[0], img.shape[1]
        return img, kp / jnp.asarray([w, h], jnp.float32)
    return fn, 1.0


def one_of(transforms=None, p=0.5, **_kw):
    branches = [build_transform(name, kwargs) for name, kwargs in (transforms or [])]

    def fn(key, img, kp):
        k_pick, k_apply = jax.random.split(key)
        idx = jax.random.randint(k_pick, (), 0, len(branches))
        def make_branch(b_fn, b_p):
            def branch(args):
                key_, img_, kp_ = args
                return _maybe(key_, b_p, b_fn, img_, kp_)
            return branch
        return jax.lax.switch(idx, [make_branch(f, bp) for f, bp in branches],
                              (k_apply, img, kp))
    return fn, p


TRANSFORMS_REGISTRY: Dict[str, Callable] = {
    'convert_color': convert_color,
    'random_rescale': random_rescale,
    'horizontal_flip': horizontal_flip,
    'hue_saturation_value': hue_saturation_value,
    'rgb_shift': rgb_shift,
    'random_brightness_contrast': random_brightness_contrast,
    'color_jitter': color_jitter,
    'blur': blur,
    'normalize': normalize,
    'to_tensor': to_tensor,
    'one_of': one_of,
    'random_rotate': random_rotate,
}

_HOST_ONLY = {'resize'}  # consumed by the host loader (static shapes)
# geometric warps default to the host loader threads (cv2): they lower to
# gathers on TPU (~250ms per 128x224² batch, measured) vs ~0.2ms/img on host
_HOST_GEOMETRIC = {'random_rotate', 'random_rescale'}


def build_transform(name, kwargs):
    return TRANSFORMS_REGISTRY[name](**dict(kwargs))


def apply_pipeline(steps: Sequence, key, img, kp):
    """Apply [(fn, p), ...] to one sample with independent sub-keys."""
    keys = jax.random.split(key, max(len(steps), 1))
    for (fn, p), k in zip(steps, keys):
        if p >= 1.0:
            img, kp = fn(k, img, kp)
        else:
            img, kp = _maybe(k, p, fn, img, kp)
    return img, kp


def build_augmentations(cfg, host_geometric=True):
    """Returns (train_fn, test_fn): batched, jittable
    ``(imgs_u8 [B,H,W,3], kps_px [B,9,2], key) -> (imgs_f32, kps_01)``.
    Mirrors builders/build_augmentations (loader_builder.py:63-68).

    With ``host_geometric`` (default) the geometric warps are excluded here
    and run in the loader threads instead (data/host_transforms.py)."""
    skip = _HOST_ONLY | (_HOST_GEOMETRIC if host_geometric else set())

    def compile_pipeline(pipeline_cfg):
        steps = [build_transform(name, kwargs)
                 for name, kwargs in pipeline_cfg
                 if name not in skip]

        def batched(imgs, kps, key):
            imgs = imgs.astype(jnp.float32)
            kps = kps.astype(jnp.float32)
            keys = jax.random.split(key, imgs.shape[0])
            return jax.vmap(lambda k, i, p: apply_pipeline(steps, k, i, p))(
                keys, imgs, kps)
        return batched

    return (compile_pipeline(cfg.train_data_pipeline),
            compile_pipeline(cfg.test_data_pipeline))
