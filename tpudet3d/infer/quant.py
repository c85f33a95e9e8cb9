"""Post-training int8 quantization (PTQ) for serving.

TPU v5e's MXU executes int8×int8→int32 at 2× the bf16 rate (394 vs 197
TOPS), so quantizing the dense convolutions — where virtually all of the
two-stage engine's FLOPs live — is the next serving lever after bf16
preprocessing (BASELINE.md round 3).  The reference ecosystem reaches
the same capability through OpenVINO's post-training-optimization
tooling on CPU; the reference itself deploys f32 IR
(/root/reference/scripts/export.py:25-39).  This module is the
TPU-native equivalent, built on two pieces:

1. ``calibrate(model, variables, batches)`` — runs the f32/bf16 model
   eagerly under a flax method interceptor that records the absmax of
   every ``nn.Conv`` input, keyed by module path.  Do this on CPU: the
   weights are identical and eager per-op dispatch through the TPU
   tunnel would pay RTT per op.
2. ``quant_interceptor(scales)`` — an ``nn.intercept_methods``
   interceptor that replaces each dense (``feature_group_count == 1``)
   ``nn.Conv.__call__`` with: symmetric per-tensor int8 quantization of
   the input (calibrated scale), symmetric per-output-channel int8
   quantization of the kernel, ``lax.conv_general_dilated`` with int8
   operands and ``preferred_element_type=int32`` (the int8 MXU path),
   then a float rescale.  Depthwise convs (groups > 1) stay in bf16 —
   they are VPU/bandwidth-bound, not MXU-bound, and carry most of the
   quantization-noise risk for near-zero FLOP savings.

The interceptor design means ALL model families (MobileNetV2/V3,
EfficientNet-lite, the SSD detector and its heads) quantize without any
change to their module code, and the quantized forward stays a pure
jittable function of (variables, inputs): weight quantization happens
in-graph from the f32 params, so the same checkpoint serves both
precisions.

Measured accuracy (trained chain, CPU, round 3, after the snapshot-
restore fix in utils/checkpoint.py): absmax per-tensor activation
scales quantize BOTH stages safely — detector box drift ~4 px at 480p
(inside the regressor's U(2,18)-px crop-jitter training band and
cleaned up by the keypoint-refinement pass), trained-el0 regressor
keypoint drift mean 0.33 px / p95 0.95 px / max 3.9 px per 224-crop,
class labels 100% agreed, protocol mean 2D error within 0.002 of bf16.
Honest negatives, measured and rejected: ``method='p999'`` is ~5x
WORSE (1.70 px mean — clipping the top 0.1% of activations costs far
more than the coarser scale saves), and excluding the MBConv project
convs from quantization changes nothing (0.326 vs 0.325 px), so there
is no mixed-precision conv list to maintain.
"""

from contextlib import contextmanager
from typing import Dict, Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

__all__ = ['calibrate', 'quant_interceptor', 'quantized_apply',
           'intercepting', 'calibrate_engine']


def _conv_path(ctx) -> Optional[str]:
    """Module path string for an intercepted dense-conv call, else None."""
    m = ctx.module
    if not isinstance(m, nn.Conv) or ctx.method_name != '__call__':
        return None
    if getattr(m, 'feature_group_count', 1) != 1:
        return None          # depthwise: keep bf16 (VPU-bound, risky)
    return '/'.join(str(p) for p in m.path)


def _flatten_stats(tree, prefix=()) -> Dict[str, float]:
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            out.update(_flatten_stats(v, prefix + (k,)))
        else:
            # sow leaf: named 'absmax', value possibly a 1-tuple
            val = v[0] if isinstance(v, (tuple, list)) else v
            out['/'.join(prefix)] = float(np.asarray(val))
    return out


def calibrate(model, variables, batches: Iterable, method: str = 'absmax',
              **apply_kwargs) -> Dict[str, float]:
    """Run the model over ``batches`` (an iterable of apply-arg tuples)
    and return {conv_path: input_absmax}.

    ``method='absmax'`` (default) records each conv input's |x| max by
    ``sow``-ing it into a ``quant_stats`` collection inside ONE jitted
    forward per batch — a single device dispatch, so calibration is
    usable even through a high-RTT host↔device link.  ``method='p999'``
    (99.9th percentile, robust to single-pixel outliers) needs the full
    activations on host and therefore runs eagerly — use it on CPU."""
    stats: Dict[str, float] = {}

    if method == 'p999':
        def recorder(next_fun, args, kwargs, ctx):
            path = _conv_path(ctx)
            if path is not None and args:
                x = np.asarray(jax.device_get(args[0]), np.float32)
                v = float(np.percentile(np.abs(x), 99.9))
                stats[path] = max(stats.get(path, 0.0), v)
            return next_fun(*args, **kwargs)

        with nn.intercept_methods(recorder):
            for batch in batches:
                model.apply(variables, *batch, **apply_kwargs)
        return stats

    def recorder(next_fun, args, kwargs, ctx):
        path = _conv_path(ctx)
        if path is not None and args:
            ctx.module.sow('quant_stats', 'absmax',
                           jnp.max(jnp.abs(args[0].astype(jnp.float32))),
                           init_fn=lambda: jnp.float32(0.0),
                           reduce_fn=jnp.maximum)
        return next_fun(*args, **kwargs)

    @jax.jit
    def run(variables, *batch):
        with nn.intercept_methods(recorder):
            _, mut = model.apply(variables, *batch,
                                 mutable=['quant_stats'], **apply_kwargs)
        return mut['quant_stats']

    for batch in batches:
        flat = _flatten_stats(jax.device_get(run(variables, *batch)))
        for k, v in flat.items():
            stats[k] = max(stats.get(k, 0.0), v)
    return stats


def quant_interceptor(act_scales: Dict[str, float]):
    """Interceptor executing calibrated dense convs on the int8 MXU path.

    Convs whose path is missing from ``act_scales`` (or whose layout is
    not the ConvBN NHWC/HWIO shape) fall through to the original bf16
    call — partial calibration degrades gracefully."""

    def interceptor(next_fun, args, kwargs, ctx):
        path = _conv_path(ctx)
        s_x = act_scales.get(path) if path is not None else None
        m = ctx.module
        kernel = (m.variables.get('params', {}).get('kernel')
                  if s_x else None)
        if not s_x or kernel is None or kernel.ndim != 4:
            return next_fun(*args, **kwargs)
        x = args[0]
        if x.ndim != 4:
            return next_fun(*args, **kwargs)

        strides = m.strides if isinstance(m.strides, tuple) else \
            (m.strides, m.strides)
        padding = m.padding    # ConvBN always passes explicit [(p,p),(p,p)]
        if not isinstance(padding, (list, tuple)):
            return next_fun(*args, **kwargs)

        # input: symmetric per-tensor int8 with the calibrated scale
        inv_sx = np.float32(127.0 / max(s_x, 1e-12))
        x_i8 = jnp.clip(jnp.round(x.astype(jnp.float32) * inv_sx),
                        -127, 127).astype(jnp.int8)
        # kernel: symmetric per-output-channel int8, computed in-graph
        # from the f32 params (same checkpoint serves both precisions)
        k = kernel.astype(jnp.float32)
        s_w = jnp.maximum(jnp.max(jnp.abs(k), axis=(0, 1, 2)), 1e-12)
        k_i8 = jnp.clip(jnp.round(k * (127.0 / s_w)), -127, 127) \
            .astype(jnp.int8)
        y = jax.lax.conv_general_dilated(
            x_i8, k_i8, strides, list(padding),
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
            preferred_element_type=jnp.int32)
        out_dtype = m.dtype or jnp.float32
        scale = (s_w * np.float32(s_x / (127.0 * 127.0))).astype(out_dtype)
        y = y.astype(out_dtype) * scale
        bias = m.variables.get('params', {}).get('bias')
        if bias is not None:
            y = y + bias.astype(out_dtype)
        return y

    return interceptor


@contextmanager
def intercepting(act_scales: Optional[Dict[str, float]]):
    """``with intercepting(scales): model.apply(...)`` — no-op when
    ``scales`` is falsy, so call sites need no branching."""
    if not act_scales:
        yield
        return
    with nn.intercept_methods(quant_interceptor(act_scales)):
        yield


def quantized_apply(model, variables, *args,
                    act_scales: Dict[str, float], **kwargs):
    """Convenience: one quantized forward."""
    with intercepting(act_scales):
        return model.apply(variables, *args, **kwargs)


def calibrate_engine(engine, frames, method: str = 'absmax'):
    """Calibrate both stages of a ``TwoStageEngine`` on representative
    frames and return ``(det_scales, reg_scales)`` ready for
    ``EngineConfig.det_int8_scales`` / ``reg_int8_scales``.

    Reproduces the engine's stage inputs eagerly (resize/255 for the
    detector; detector-box + margin crops, mean/std-normalized, for the
    regressor — infer/engine.py pipeline_core) so the recorded absmax
    matches what the fused program will feed each conv.  Run on CPU:
    eager per-op dispatch through the TPU tunnel pays RTT per op, and
    the weights are identical.  frames: [N,H,W,3] uint8 array or a list
    of HWC uint8 frames (mixed shapes fine — eval shards vary)."""
    from ..detect import generate_anchors, decode_detections, INPUT_SIZE
    from ..ops.image import crop_and_resize, resize_bilinear
    from .engine import REG_MEAN, REG_STD

    cfg = engine.cfg
    rgb = [np.asarray(f)[..., ::-1] if cfg.input_is_bgr else np.asarray(f)
           for f in frames]
    det_in = jnp.stack([
        resize_bilinear(jnp.asarray(f), (INPUT_SIZE, INPUT_SIZE),
                        dtype=jnp.float32) / 255.0 for f in rgb])
    det_scales = calibrate(engine.det_model, engine.det_vars, [(det_in,)],
                           method=method, train=False)

    logits, deltas = engine.det_model.apply(engine.det_vars, det_in,
                                            train=False)
    anchors = jnp.asarray(generate_anchors())
    mean = np.asarray(REG_MEAN, np.float32) * 255.0
    std = np.asarray(REG_STD, np.float32) * 255.0
    crop_batches = []
    for i, f in enumerate(rgb):
        h, w = f.shape[:2]
        scale = np.asarray([w / INPUT_SIZE, h / INPUT_SIZE] * 2, np.float32)
        dets = np.asarray(decode_detections(
            logits[i], deltas[i], anchors, score_thr=cfg.score_thr,
            iou_thr=cfg.nms_iou, max_per_img=cfg.max_detections,
            pre_nms_k=max(4 * cfg.max_detections, 32),
            soft_nms_sigma=cfg.soft_nms_sigma,
            soft_nms_dup_iou=cfg.soft_nms_dup_iou))
        boxes = dets[dets[:, 4] > cfg.det_conf][:, :4] * scale
        if not len(boxes):
            continue
        m = float(cfg.crop_margin_px)
        boxes = np.clip(boxes + np.asarray([-m, -m, m, m], np.float32),
                        0, np.asarray([w, h, w, h], np.float32))
        crops = crop_and_resize(jnp.asarray(f), jnp.asarray(boxes),
                                cfg.crop_size)
        crop_batches.append((np.asarray(crops, np.float32) - mean) / std)
    if not crop_batches:
        # no confident detections on the calibration frames: quantize the
        # detector only; an empty scales dict leaves the regressor in bf16
        # (intercepting({}) is a no-op)
        import warnings
        warnings.warn('calibrate_engine: no detections above det_conf on '
                      'the calibration frames — regressor stays bf16')
        return det_scales, {}
    crops = jnp.asarray(np.concatenate(crop_batches))
    reg_scales = calibrate(engine.reg_model, engine.reg_vars, [(crops,)],
                           method=method, export=True)
    return det_scales, reg_scales
