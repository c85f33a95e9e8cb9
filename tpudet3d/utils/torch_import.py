"""Import pretrained torch checkpoints into the Flax parameter tree.

Capability parity with the reference's pretrained-weight bootstrap
(torchdet3d/models/mobilenetv3.py:234-271 downloads d-li14 / 21k torch
checkpoints; torchdet3d/utils/utils.py:127-183 loads them tolerantly).
This environment has no egress, so the entry point takes a *local* torch
checkpoint path; unmatched/shape-mismatched tensors are skipped with a
report, like the reference loader.

Key transforms torch→flax(NHWC):
  conv weight  [O,I,kh,kw]  → [kh,kw,I,O]
  dw conv      [C,1,kh,kw]  → [kh,kw,1,C]
  linear       [O,I]        → [I,O]
  bn           weight/bias/running_mean/running_var → scale/bias/mean/var
"""

from typing import Dict

import numpy as np

__all__ = ['torch_state_dict_to_flax', 'load_torch_checkpoint_into']


def _convert_tensor(name, tensor):
    arr = np.asarray(tensor)
    if arr.ndim == 4:           # conv: OIHW → HWIO
        return arr.transpose(2, 3, 1, 0)
    if arr.ndim == 2:           # linear: OI → IO
        return arr.T
    return arr


def torch_state_dict_to_flax(state_dict) -> Dict[str, np.ndarray]:
    """Flat {torch_name: converted array} with layout transforms applied."""
    out = {}
    for k, v in state_dict.items():
        if k.endswith('num_batches_tracked'):
            continue
        try:
            arr = v.detach().cpu().numpy()
        except AttributeError:
            arr = np.asarray(v)
        out[k] = _convert_tensor(k, arr)
    return out


def load_torch_checkpoint_into(params, batch_stats, checkpoint_path,
                               name_map=None, verbose=True):
    """Best-effort structural merge of a torch checkpoint into flax trees.

    Without an explicit ``name_map`` the merge is by *ordered shape
    matching* within parameter kinds (conv kernels, bn scales, ...), which
    is exact for sequentially-built trunks like MobileNetV3: both trees
    enumerate layers in construction order.
    """
    import torch
    import jax

    ckpt = torch.load(checkpoint_path, map_location='cpu')
    if 'state_dict' in ckpt:
        ckpt = ckpt['state_dict']
    flat_torch = torch_state_dict_to_flax(ckpt)

    leaves, treedef = jax.tree_util.tree_flatten_with_path(params)
    bn_leaves, bn_treedef = jax.tree_util.tree_flatten_with_path(batch_stats)

    def classify(path_str, arr):
        if arr.ndim == 4:
            return 'conv'
        if arr.ndim == 2:
            return 'dense'
        if 'mean' in path_str:
            return 'bn_mean'
        if 'var' in path_str:
            return 'bn_var'
        if 'scale' in path_str or 'weight' in path_str:
            return 'bn_scale'
        return 'bias'

    torch_by_kind = {}
    for name, arr in flat_torch.items():
        kind = ('bn_mean' if name.endswith('running_mean') else
                'bn_var' if name.endswith('running_var') else
                'conv' if arr.ndim == 4 else
                'dense' if arr.ndim == 2 else
                'bn_scale' if name.endswith('weight') else 'bias')
        torch_by_kind.setdefault(kind, []).append((name, arr))

    used = {k: 0 for k in torch_by_kind}
    matched, skipped = 0, 0

    def take(kind, shape):
        nonlocal matched, skipped
        queue = torch_by_kind.get(kind, [])
        i = used.get(kind, 0)
        if i < len(queue) and queue[i][1].shape == tuple(shape):
            used[kind] = i + 1
            matched += 1
            return queue[i][1]
        skipped += 1
        return None

    def merge(flat, kinds_hint):
        out = []
        for path, leaf in flat:
            path_str = jax.tree_util.keystr(path)
            kind = classify(path_str, np.asarray(leaf))
            cand = take(kind, np.shape(leaf))
            out.append(cand.astype(np.asarray(leaf).dtype)
                       if cand is not None else leaf)
        return out

    new_params = jax.tree_util.tree_unflatten(
        treedef, merge(leaves, 'params'))
    new_bs = jax.tree_util.tree_unflatten(
        bn_treedef, merge(bn_leaves, 'stats'))
    if verbose:
        print(f'torch import: matched {matched} tensors, skipped {skipped}')
    if matched == 0:
        raise RuntimeError('no torch tensors could be matched')
    return new_params, new_bs
