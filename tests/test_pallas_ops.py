"""Pallas kernel tests (interpret mode on the CPU mesh)."""

import numpy as np
import jax.numpy as jnp

from tpudet3d.ops.pallas import preprocess_images

MEAN = (0.5931, 0.4690, 0.4229)
STD = (0.2471, 0.2214, 0.2157)


class TestPreprocess:

    def test_matches_reference_math(self):
        rng = np.random.RandomState(0)
        img = rng.randint(0, 255, (2, 17, 23, 3)).astype(np.uint8)
        out = np.asarray(preprocess_images(jnp.asarray(img), MEAN, STD))
        ref = (img.astype(np.float32) - np.asarray(MEAN) * 255) / \
            (np.asarray(STD) * 255)
        assert np.abs(out - ref).max() < 1e-5

    def test_channel_reversal(self):
        rng = np.random.RandomState(1)
        img = rng.randint(0, 255, (8, 8, 3)).astype(np.uint8)
        out = np.asarray(preprocess_images(jnp.asarray(img), MEAN, STD,
                                           reverse_channels=True))
        ref = (img[..., ::-1].astype(np.float32) - np.asarray(MEAN) * 255) / \
            (np.asarray(STD) * 255)
        assert np.abs(out - ref).max() < 1e-5

    def test_bf16_output(self):
        img = np.full((4, 4, 3), 128, np.uint8)
        out = preprocess_images(jnp.asarray(img), MEAN, STD,
                                out_dtype=jnp.bfloat16)
        assert out.dtype == jnp.bfloat16
