"""PTQ int8 path (tpudet3d/infer/quant.py): calibration, interceptor
semantics (dense convs only, graceful fallthrough), numeric closeness,
jittability."""

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from tpudet3d.models.layers import ConvBN
from tpudet3d.infer.quant import calibrate, quantized_apply, intercepting


class _Net(nn.Module):
    """conv → depthwise conv → conv, ConvBN-style."""

    @nn.compact
    def __call__(self, x, train=False):
        x = ConvBN(16, 3, 1, act=None, dtype=jnp.float32)(x, train)
        x = ConvBN(16, 3, 1, groups=16, act=None, dtype=jnp.float32)(x, train)
        return ConvBN(8, 1, 1, act=None, dtype=jnp.float32)(x, train)


def _setup():
    rng = np.random.default_rng(0)
    m = _Net()
    x = jnp.asarray(rng.standard_normal((2, 16, 16, 4)), jnp.float32)
    v = m.init(jax.random.PRNGKey(0), x)
    return m, v, x


class TestCalibrate:

    def test_records_only_dense_convs(self):
        m, v, x = _setup()
        scales = calibrate(m, v, [(x,)])
        # 3 ConvBNs but the middle one is depthwise → 2 calibrated
        assert len(scales) == 2
        assert all(s > 0 for s in scales.values())

    def test_running_max_over_batches(self):
        m, v, x = _setup()
        s1 = calibrate(m, v, [(x,)])
        s2 = calibrate(m, v, [(x,), (2.0 * x,)])
        for k in s1:
            assert s2[k] >= s1[k]


class TestQuantForward:

    def test_close_to_f32(self):
        m, v, x = _setup()
        ref = np.asarray(m.apply(v, x))
        scales = calibrate(m, v, [(x,)])
        q = np.asarray(quantized_apply(m, v, x, act_scales=scales))
        rel = np.abs(q - ref).max() / (np.abs(ref).max() + 1e-9)
        assert rel < 0.05, rel

    def test_empty_scales_is_identity(self):
        m, v, x = _setup()
        ref = np.asarray(m.apply(v, x))
        with intercepting({}):
            out = np.asarray(m.apply(v, x))
        assert np.array_equal(out, ref)

    def test_partial_scales_fall_through(self):
        m, v, x = _setup()
        scales = calibrate(m, v, [(x,)])
        some = {next(iter(scales)): scales[next(iter(scales))]}
        q = np.asarray(quantized_apply(m, v, x, act_scales=some))
        ref = np.asarray(m.apply(v, x))
        rel = np.abs(q - ref).max() / (np.abs(ref).max() + 1e-9)
        assert rel < 0.05

    def test_engine_int8_end_to_end(self):
        """calibrate_engine → int8 EngineConfig → fused forward runs and
        stays close to the bf16 engine on the same frame."""
        from tpudet3d.core import AttrDict
        from tpudet3d.detect import SSDDetector
        from tpudet3d.models import build_model
        from tpudet3d.infer.engine import TwoStageEngine, EngineConfig
        from tpudet3d.infer.quant import calibrate_engine

        rng = np.random.default_rng(0)
        k = jax.random.PRNGKey(0)
        det = SSDDetector(num_classes=9, dtype=jnp.bfloat16)
        dv = jax.jit(det.init)(k, jnp.zeros((1, 300, 300, 3), jnp.float32))
        cfg = AttrDict(model=dict(name='mobilenetv3_small', pretrained=False,
                                  num_classes=9, bf16=True), output_dir='')
        reg = build_model(cfg)
        rv = jax.jit(reg.init)({'params': k, 'dropout': k},
                               jnp.zeros((1, 224, 224, 3), jnp.float32),
                               jnp.zeros((1,), jnp.int32))
        # random weights give ~uniform scores; det_conf=0 keeps every
        # decoded row so calibration finds crops
        ecfg = EngineConfig(det_conf=0.0, score_thr=1e-4,
                            crop_margin_px=10.0)
        eng = TwoStageEngine(det, dv, reg, rv, ecfg)
        frames = rng.integers(0, 255, (2, 240, 320, 3)).astype(np.uint8)
        ds, rs = calibrate_engine(eng, frames)
        assert len(ds) > 10 and len(rs) > 10
        ref = eng(frames[0])

        qcfg = EngineConfig(det_conf=0.0, score_thr=1e-4,
                            crop_margin_px=10.0,
                            det_int8_scales=ds, reg_int8_scales=rs)
        qeng = TwoStageEngine(det, dv, reg, rv, qcfg)
        out = qeng(frames[0])
        assert out['boxes'].shape == ref['boxes'].shape
        assert np.all(np.isfinite(out['boxes']))
        assert np.all(np.isfinite(out['kp']))
        # scores of the top detection stay in the same ballpark
        if len(ref['scores']) and len(out['scores']):
            assert abs(float(ref['scores'][0]) -
                       float(out['scores'][0])) < 0.2

    def test_jittable_and_int8_dot_in_hlo(self):
        m, v, x = _setup()
        scales = calibrate(m, v, [(x,)])
        fn = jax.jit(lambda v, x: quantized_apply(m, v, x,
                                                  act_scales=scales))
        eager = np.asarray(quantized_apply(m, v, x, act_scales=scales))
        jitted = np.asarray(fn(v, x))
        assert np.allclose(jitted, eager, atol=1e-4)
        # the lowered program must actually convolve in int8 (i8 operands,
        # i32 accumulate) — that is the whole point of the path
        hlo = fn.lower(v, x).as_text()
        assert 'xi8>' in hlo and 'xi32>' in hlo
