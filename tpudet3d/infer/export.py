"""AOT export of deployment artifacts.

The reference exports torch → ONNX → OpenVINO IR, baking x255 mean/scale and
BGR→RGB reversal into the IR via Model Optimizer flags
(/root/reference/scripts/export.py:25-39, SURVEY.md §8.13).  The TPU-native
equivalent: the jitted inference function *includes* the preprocessing
constants (consumes raw uint8 BGR crops) and is serialized with
``jax.export`` (portable StableHLO artifact) plus a human-readable
StableHLO text dump.
"""

import os.path as osp

import jax
import jax.numpy as jnp

from ..core import mkdir_if_missing

__all__ = ['export_regressor', 'load_exported']

REG_MEAN = (0.5931, 0.4690, 0.4229)
REG_STD = (0.2471, 0.2214, 0.2157)


def make_export_fn(model, variables, img_size=(128, 128), bgr_input=True):
    """Deployment graph: raw uint8 [B,h,w,3] (BGR) → (all-heads kp
    [9,B,9,2], logits [B,C]) — preprocessing folded in, matching the
    reference's exported IR contract (raw BGR uint8 in, reference
    export.py:67-68 + forward_to_onnx)."""
    mean = jnp.asarray(REG_MEAN, jnp.float32) * 255
    std = jnp.asarray(REG_STD, jnp.float32) * 255

    def fn(raw_u8):
        x = raw_u8.astype(jnp.float32)
        if bgr_input:
            x = x[..., ::-1]
        x = (x - mean) / std
        return model.apply(variables, x, export=True)

    return fn


def export_regressor(model, variables, save_path, img_size=(128, 128),
                     batch_size=1):
    """Serialize the deployment graph.  Writes:
    <save_path>/model.jaxexport  — portable serialized StableHLO artifact
    <save_path>/model.stablehlo.mlir — human-readable IR dump
    """
    mkdir_if_missing(save_path)
    # host copy first: lowering a closure over on-device params fetches
    # each of the ~300 leaves separately — on a high-RTT host->TPU link
    # that costs minutes per lowering (see __graft_entry__.entry)
    variables = jax.device_get(variables)
    fn = make_export_fn(model, variables, img_size)
    spec = jax.ShapeDtypeStruct((batch_size, *img_size, 3), jnp.uint8)
    jitted = jax.jit(fn)
    exported = jax.export.export(jitted)(spec)
    blob = exported.serialize()
    with open(osp.join(save_path, 'model.jaxexport'), 'wb') as f:
        f.write(blob)
    # reuse the already-lowered module instead of lowering a second time
    mlir_text = str(exported.mlir_module())
    with open(osp.join(save_path, 'model.stablehlo.mlir'), 'w') as f:
        f.write(mlir_text)
    print(f'exported deployment artifact to {save_path} '
          f'({len(blob)} bytes serialized, input uint8 {batch_size}x'
          f'{img_size[0]}x{img_size[1]}x3 BGR)')
    return exported


def load_exported(save_path):
    """Rehydrate a serialized artifact; returns a callable."""
    with open(osp.join(save_path, 'model.jaxexport'), 'rb') as f:
        exported = jax.export.deserialize(f.read())
    return lambda x: exported.call(x)
