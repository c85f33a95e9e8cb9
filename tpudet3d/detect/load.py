"""Checkpoint-driven detector construction.

The reference builds its SSD through mmdetection's ``init_detector`` with
a config naming the architecture (demo/objectron_eval load a .pth against
it).  Here the snapshot itself carries the architecture signal: a cascade
checkpoint (SSDDetector(cascade=True)) contains ``reg2_heads_*`` params,
so ``load_detector`` inspects the restored tree and instantiates the
matching model — callers never pass an architecture flag, and a cascade
snapshot silently upgrading a non-cascade consumer (or vice versa) is
impossible.
"""

import os.path as osp

import jax
import jax.numpy as jnp

from .anchors import INPUT_SIZE
from .ssd import SSDDetector

__all__ = ['load_detector']


def load_detector(det_checkpoint, dtype=jnp.bfloat16, num_classes=9,
                  width_mult=None, input_size=INPUT_SIZE):
    """Restore a detector snapshot → (model, variables).

    Prefers the EMA average when the snapshot carries one (same policy as
    the training-time validator, scripts/train_detector.py).  The model
    is constructed cascade-iff-the-checkpoint-is (``reg2_heads_0`` in the
    saved params is the discriminator) and, when ``width_mult`` is None,
    at the checkpoint's own width (inferred from the stem kernel's output
    channels — MNv2 stem is 32·width).  The merge is STRICT: any
    unmatched leaf raises instead of silently serving a half-initialized
    detector.
    """
    import orbax.checkpoint as ocp
    from ..utils.checkpoint import merge_matching

    with ocp.StandardCheckpointer() as ckptr:
        restored = ckptr.restore(osp.abspath(det_checkpoint))
    saved = restored['state'] if 'state' in restored else restored
    saved_params = saved.get('ema_params') or saved['params']
    cascade = 'reg2_heads_0' in saved_params
    if width_mult is None:
        stem_out = saved_params['backbone']['ConvBN_0']['Conv_0'][
            'kernel'].shape[-1]
        width_mult = stem_out / 32.0

    model = SSDDetector(num_classes=num_classes, width_mult=width_mult,
                        dtype=dtype, cascade=cascade)
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0),
        jnp.zeros((1, input_size, input_size, 3), jnp.float32))
    target = jax.device_get(variables['params'])
    n_target = len(jax.tree_util.tree_leaves(target))
    merged, n_loaded = merge_matching(target, saved_params,
                                      return_count=True)
    if n_loaded != n_target:
        raise ValueError(
            f'detector snapshot {det_checkpoint} matched only {n_loaded}/'
            f'{n_target} leaves of SSDDetector(width_mult={width_mult}, '
            f'cascade={cascade}) — wrong architecture or corrupt snapshot')
    variables = {
        'params': merged,
        'batch_stats': saved.get('batch_stats',
                                 variables.get('batch_stats', {})),
    }
    return model, variables
