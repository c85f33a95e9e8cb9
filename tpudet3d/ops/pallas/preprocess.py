"""Pallas TPU kernel: fused uint8→normalized-float image preprocessing.

One pass over HBM: uint8 pixels are upcast, channel-reversed (BGR→RGB) and
mean/std-normalized directly into the compute dtype — the bandwidth-bound
preamble of the training step and the inference engine, with no
intermediate f32 image materialization.

Layout: the image batch is viewed as 3 channel planes [3, P] (P = all
pixels), padded to an (8, 128k)-tileable buffer; the kernel streams
(8, BLOCK) tiles through VMEM applying the per-channel affine transform.
Falls back to interpret mode off-TPU (CPU tests).
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ['preprocess_images']

_BLOCK = 2048
_ROWS = 8   # f32 sublane tile; rows 0..2 hold the channels


def _kernel(img_ref, mean_ref, inv_std_ref, out_ref):
    x = img_ref[...].astype(jnp.float32)
    out_ref[...] = ((x - mean_ref[...]) * inv_std_ref[...]).astype(
        out_ref.dtype)


@functools.partial(jax.jit, static_argnames=('reverse_channels', 'out_dtype',
                                             'interpret'))
def preprocess_images(images, mean, std, reverse_channels=False,
                      out_dtype=jnp.float32, interpret=None):
    """images [..., 3] uint8 → normalized [..., 3] out_dtype.

    mean/std are in [0,1] units, scaled by 255 internally (matching the
    dataset normalization and the reference's baked IR constants,
    reference scripts/export.py:67-68).  ``reverse_channels`` folds the
    BGR→RGB flip into the same pass.
    """
    if interpret is None:
        interpret = jax.default_backend() != 'tpu'
    shape = images.shape
    assert shape[-1] == 3
    planes = images.reshape(-1, 3).T               # [3, P]
    if reverse_channels:
        planes = planes[::-1]
    n_pixels = planes.shape[1]
    pad = (-n_pixels) % _BLOCK
    planes = jnp.pad(planes, ((0, _ROWS - 3), (0, pad)))

    mean_col = jnp.zeros((_ROWS, 1), jnp.float32).at[:3, 0].set(
        jnp.asarray(mean, jnp.float32) * 255.0)
    inv_col = jnp.ones((_ROWS, 1), jnp.float32).at[:3, 0].set(
        1.0 / (jnp.asarray(std, jnp.float32) * 255.0))

    grid = (planes.shape[1] // _BLOCK,)
    out = pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct(planes.shape, out_dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((_ROWS, _BLOCK), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_ROWS, 1), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_ROWS, 1), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_ROWS, _BLOCK), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(planes, mean_col, inv_col)

    out = out[:3, :n_pixels].T.reshape(shape)
    return out
