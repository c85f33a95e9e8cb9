"""Export round-trip: serialize with jax.export, reload, compare outputs."""

import numpy as np
import jax
import jax.numpy as jnp

from tpudet3d.core import AttrDict
from tpudet3d.models import build_model
from tpudet3d.infer.export import (export_regressor, load_exported,
                                   make_export_fn)


def small_model():
    cfg = AttrDict(model=dict(name='mobilenetv3_small', pretrained=False,
                              num_classes=9, bf16=False))
    model = build_model(cfg)
    key = jax.random.PRNGKey(0)
    x = jnp.zeros((1, 32, 32, 3), jnp.float32)
    variables = model.init({'params': key, 'dropout': key}, x,
                           jnp.zeros((1,), jnp.int32))
    return model, variables


class TestExport:

    def test_roundtrip(self, tmp_path):
        model, variables = small_model()
        export_regressor(model, variables, str(tmp_path), img_size=(32, 32),
                         batch_size=1)
        assert (tmp_path / 'model.jaxexport').exists()
        mlir = (tmp_path / 'model.stablehlo.mlir').read_text()
        assert 'stablehlo' in mlir or 'func.func' in mlir

        fn = load_exported(str(tmp_path))
        raw = np.random.RandomState(0).randint(0, 255, (1, 32, 32, 3)) \
            .astype(np.uint8)
        kp_r, logits_r = fn(jnp.asarray(raw))
        direct = make_export_fn(model, variables, (32, 32))
        kp_d, logits_d = direct(jnp.asarray(raw))
        assert np.allclose(np.asarray(kp_r), np.asarray(kp_d), atol=1e-5)
        assert np.allclose(np.asarray(logits_r), np.asarray(logits_d),
                           atol=1e-4)
        # output contract: all 9 heads, sigmoid kp in [0,1]
        assert kp_r.shape == (9, 1, 9, 2)
        assert np.all((np.asarray(kp_r) >= 0) & (np.asarray(kp_r) <= 1))

    def test_preprocessing_folded(self, tmp_path):
        """The exported graph consumes raw uint8 BGR — mean/scale baked in
        (reference export.py:25-39 parity)."""
        model, variables = small_model()
        fn = make_export_fn(model, variables, (32, 32), bgr_input=True)
        raw = np.random.RandomState(1).randint(0, 255, (1, 32, 32, 3)) \
            .astype(np.uint8)
        kp_a, _ = fn(jnp.asarray(raw))
        # manual preprocess + export=False path should agree
        mean = np.asarray([0.5931, 0.4690, 0.4229]) * 255
        std = np.asarray([0.2471, 0.2214, 0.2157]) * 255
        manual = (raw[..., ::-1].astype(np.float32) - mean) / std
        kp_b, _ = model.apply(variables, jnp.asarray(manual), export=True)
        assert np.allclose(np.asarray(kp_a), np.asarray(kp_b), atol=1e-5)
