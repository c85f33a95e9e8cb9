"""Verify a real pretrained torch checkpoint against the pinned contract.

Run this on any downloaded checkpoint BEFORE training with it (see
docs/pretrained_weights.md): it compares the file's full key/shape list and
iteration order against the published-layout contract
(tpudet3d/utils/pretrained_contract.py), then performs the strict import
into the Flax model, failing on any silent FIFO desync.

Mirrors the role of the reference's tolerant loader + download step
(torchdet3d/models/mobilenetv3.py:234-271, torchdet3d/utils/utils.py:127-183)
but with a hard contract instead of silent tolerance.
"""

import argparse
import os.path as osp
import sys

sys.path.insert(0, osp.join(osp.dirname(__file__), '..'))


CONTRACTS = {
    'mobilenetv3_large': [('dli14', None)],
    'mobilenetv3_small': [('dli14', None)],
    'mobilenetv3_large_21k': [('timm', 11221), ('timm', 1000)],
    'efficientnet-lite0': [('lite', None)],
    'efficientnet-lite1': [('lite', None)],
    'efficientnet-lite2': [('lite', None)],
}

ALLOW_UNUSED = {
    'dli14': (r'classifier\.3\.(weight|bias)',),
    'timm': (r'classifier\.(weight|bias)',),
    'lite': (r'_fc\.(weight|bias)',),
}


def get_contract(model, kind, num_classes):
    from tpudet3d.utils import pretrained_contract as pc
    if kind == 'dli14':
        return pc.dli14_mobilenetv3(model.rsplit('_', 1)[-1])
    if kind == 'timm':
        return pc.timm_mobilenetv3_large_100(num_classes)
    return pc.efficientnet_lite(model)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--model', required=True, choices=sorted(CONTRACTS))
    ap.add_argument('--ckpt', required=True)
    ap.add_argument('--strip_prefix', default='',
                    help="key prefix to strip, e.g. 'module.' or 'model.'")
    args = ap.parse_args()

    import torch
    import jax
    import jax.numpy as jnp
    from tpudet3d.models import build_backbone
    from tpudet3d.utils.pretrained_contract import verify_state_dict
    from tpudet3d.utils.torch_import import load_torch_checkpoint_into

    # This script's whole purpose is vetting an externally downloaded
    # file BEFORE it is trusted — so the load itself must not execute
    # pickle code from it (ADVICE r4).  No legacy fallback here: a file
    # that needs unrestricted pickle fails the vetting by definition.
    ckpt = torch.load(args.ckpt, map_location='cpu', weights_only=True)
    for wrapper_key in ('state_dict', 'model'):
        if wrapper_key in ckpt and hasattr(ckpt[wrapper_key], 'items'):
            ckpt = ckpt[wrapper_key]
            break
    if args.strip_prefix:
        ckpt = {k[len(args.strip_prefix):] if k.startswith(args.strip_prefix)
                else k: v for k, v in ckpt.items()}
        import tempfile
        tmp = tempfile.NamedTemporaryFile(suffix='.pth', delete=False)
        torch.save({'state_dict': ckpt}, tmp.name)
        args.ckpt = tmp.name

    chosen = None
    for kind, nc in CONTRACTS[args.model]:
        contract = get_contract(args.model, kind, nc)
        rep = verify_state_dict(ckpt, contract)
        label = kind + (f'@{nc}cls' if nc else '')
        if rep['ok']:
            print(f'contract check [{label}]: OK '
                  f'({len(contract)} keys, order verified)')
            chosen = (kind, contract)
            break
        print(f'contract check [{label}]: MISMATCH — '
              f'missing={rep["missing"][:5]} extra={rep["extra"][:5]} '
              f'shape={rep["shape_mismatch"][:5]} order_ok={rep["order_ok"]}')
    if chosen is None:
        print('FAIL: checkpoint matches no pinned contract')
        return 1

    kind, contract = chosen
    backbone = build_backbone(args.model)
    variables = backbone.init(jax.random.PRNGKey(0),
                              jnp.zeros((1, 64, 64, 3), jnp.float32))
    report = {}
    load_torch_checkpoint_into(
        variables['params'], variables['batch_stats'], args.ckpt,
        contract=contract, allow_unused=ALLOW_UNUSED[kind], report=report)
    print(f"strict import: OK — matched {report['matched']}, "
          f"flax leaves left at init {report['skipped']}, "
          f"expected leftovers {sorted(report['leftovers'])}")
    return 0


if __name__ == '__main__':
    sys.exit(main())
