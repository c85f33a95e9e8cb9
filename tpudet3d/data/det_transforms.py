"""Device-side augmentations for the detector stage (boxes, not keypoints).

Covers the core of the reference detector pipeline
(/root/reference/configs/detection/mnv2_ssd_300_2_heads.py:66-103):
PhotoMetricDistortion (brightness ±32, contrast/saturation 0.5-1.5,
hue ±18 approximated channel-wise), RandomRotate90and270 (p=0.5),
RandomFlip (p=0.5), Normalize (x/255).  Expand + MinIoURandomCrop run on
the HOST side in the loader threads (data/det_host_transforms.py) — their
dynamic canvas sizes don't fit XLA static shapes, so they execute before
batching, like the reference's dataloader-worker augs.
"""

import jax
import jax.numpy as jnp

__all__ = ['build_detector_augmentations']


def _photometric(key, img):
    k1, k2, k3, k4 = jax.random.split(key, 4)
    img = img + jax.random.uniform(k1, minval=-32.0, maxval=32.0)
    img = img * jax.random.uniform(k2, minval=0.5, maxval=1.5)
    gray = jnp.mean(img, axis=-1, keepdims=True)
    img = gray + (img - gray) * jax.random.uniform(k3, minval=0.5, maxval=1.5)
    # cheap hue-ish channel perturbation
    img = img + jax.random.uniform(k4, (3,), minval=-18.0, maxval=18.0)
    return jnp.clip(img, 0, 255)


def _hflip(img, boxes):
    w = img.shape[1]
    flipped = img[:, ::-1, :]
    x0 = w - boxes[:, 2]
    x1 = w - boxes[:, 0]
    return flipped, jnp.stack([x0, boxes[:, 1], x1, boxes[:, 3]], axis=-1)


def _rot90(img, boxes):
    """CCW 90°: (x, y) → (y, W-x); square inputs only."""
    w = img.shape[1]
    out = jnp.rot90(img, k=1, axes=(0, 1))
    x0, y0, x1, y1 = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
    return out, jnp.stack([y0, w - x1, y1, w - x0], axis=-1)


def _rot270(img, boxes):
    w = img.shape[1]
    out = jnp.rot90(img, k=3, axes=(0, 1))
    x0, y0, x1, y1 = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
    return out, jnp.stack([w - y1, x0, w - y0, x1], axis=-1)


def build_detector_augmentations(flip_p=0.5, rot_p=0.5, train=True):
    """(imgs u8 [B,S,S,3] BGR, boxes [B,G,4], key) →
    (imgs f32 normalized RGB, boxes)."""

    def one(key, img, boxes):
        img = img.astype(jnp.float32)[..., ::-1]   # BGR → RGB (to_rgb=True)
        if train:
            k1, k2, k3, k4 = jax.random.split(key, 4)
            img = _photometric(k1, img)
            # rot90 / rot270 each with p/2 (RandomRotate90and270, p=0.5)
            r = jax.random.uniform(k2)
            img90, b90 = _rot90(img, boxes)
            img270, b270 = _rot270(img, boxes)
            img = jnp.where(r < rot_p / 2, img90,
                            jnp.where(r < rot_p, img270, img))
            boxes = jnp.where(r < rot_p / 2, b90,
                              jnp.where(r < rot_p, b270, boxes))
            do_flip = jax.random.uniform(k3) < flip_p
            fimg, fboxes = _hflip(img, boxes)
            img = jnp.where(do_flip, fimg, img)
            boxes = jnp.where(do_flip, fboxes, boxes)
        return img / 255.0, boxes

    def batched(imgs, boxes, key):
        keys = jax.random.split(key, imgs.shape[0])
        return jax.vmap(one)(keys, imgs, boxes)

    return batched
