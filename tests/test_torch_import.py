"""Pretrained torch-checkpoint import: end-to-end forward parity.

VERDICT r1 item 2: prove the ordered-shape matcher against a *real* torch
MobileNetV3 state_dict (BN stats included), not just structurally.  The
torch twin below is an independent implementation of the published
MobileNetV3 architecture in the reference's module order
(torchdet3d/models/mobilenetv3.py:126-203): expand → depthwise → SE →
project, dw-first variant when expand==in, final 1x1 conv-bn, post-pool
Linear → BatchNorm1d → hard-swish head, then an ImageNet classifier that
must be skipped by the import.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch
import torch.nn.functional as F
from torch import nn as tnn

from tpudet3d.core import AttrDict
from tpudet3d.models import build_backbone, build_model
from tpudet3d.models.layers import make_divisible
from tpudet3d.models.mobilenetv3 import MNV3_LARGE_CFG, MNV3_SMALL_CFG
from tpudet3d.utils.torch_import import (load_torch_checkpoint_into,
                                         resolve_pretrained_path)


class TorchConvBN(tnn.Module):
    def __init__(self, in_c, out_c, k, s, groups=1, act=None):
        super().__init__()
        self.conv = tnn.Conv2d(in_c, out_c, k, s, (k - 1) // 2,
                               groups=groups, bias=False)
        self.bn = tnn.BatchNorm2d(out_c)
        self.act = act

    def forward(self, x):
        x = self.bn(self.conv(x))
        return self.act(x) if self.act is not None else x


class TorchSE(tnn.Module):
    def __init__(self, c, reduction=4):
        super().__init__()
        hidden = make_divisible(c // reduction, 8)
        self.fc1 = tnn.Linear(c, hidden)
        self.fc2 = tnn.Linear(hidden, c)

    def forward(self, x):
        y = x.mean((2, 3))
        y = F.relu(self.fc1(y))
        y = F.hardsigmoid(self.fc2(y))        # relu6(x+3)/6, exact
        return x * y[:, :, None, None]


class TorchIR(tnn.Module):
    def __init__(self, inp, hidden, out, k, s, use_se, use_hs):
        super().__init__()
        self.hs = use_hs
        self.expand = (TorchConvBN(inp, hidden, 1, 1,
                                   act=F.hardswish if use_hs else F.relu)
                       if inp != hidden else None)
        self.dw = TorchConvBN(hidden, hidden, k, s, groups=hidden, act=None)
        self.se = TorchSE(hidden) if use_se else None
        self.project = TorchConvBN(hidden, out, 1, 1, act=None)
        self.identity = s == 1 and inp == out

    def _act(self, x):
        return F.hardswish(x) if self.hs else F.relu(x)

    def forward(self, x):
        y = x
        if self.expand is not None:
            y = self.expand(y)
        y = self.dw(y)
        if self.expand is None:               # dw-first: act, then SE
            y = self._act(y)
            if self.se is not None:
                y = self.se(y)
        else:
            if self.se is not None:
                y = self.se(y)
            y = self._act(y)
        y = self.project(y)
        return x + y if self.identity else y


class TorchMNv3(tnn.Module):
    def __init__(self, cfgs, feature_dim):
        super().__init__()
        layers = [TorchConvBN(3, 16, 3, 2, act=F.hardswish)]
        inp = 16
        hidden = 16
        for k, t, c, use_se, use_hs, s in cfgs:
            out = make_divisible(c, 8)
            hidden = make_divisible(inp * t, 8)
            layers.append(TorchIR(inp, hidden, out, int(k), int(s),
                                  bool(use_se), bool(use_hs)))
            inp = out
        layers.append(TorchConvBN(inp, hidden, 1, 1, act=F.hardswish))
        self.features = tnn.Sequential(*layers)
        self.head_fc = tnn.Linear(hidden, feature_dim)
        self.head_bn = tnn.BatchNorm1d(feature_dim)
        self.classifier = tnn.Linear(feature_dim, 1000)  # must be skipped

    def forward_features(self, x):
        y = self.features(x).mean((2, 3))
        return F.hardswish(self.head_bn(self.head_fc(y)))

    def forward(self, x):
        return self.classifier(self.forward_features(x))


def _randomized_twin(cfgs, feature_dim, seed):
    torch.manual_seed(seed)
    twin = TorchMNv3(cfgs, feature_dim)
    # make BN affine params non-trivial (defaults are 1/0 — too forgiving)
    for m in twin.modules():
        if isinstance(m, (tnn.BatchNorm2d, tnn.BatchNorm1d)):
            m.weight.data.uniform_(0.5, 1.5)
            m.bias.data.uniform_(-0.3, 0.3)
    # build real running stats, then freeze
    twin.train()
    with torch.no_grad():
        for _ in range(2):
            twin(torch.randn(4, 3, 64, 64))
    twin.eval()
    return twin


def _save_pth(twin, tmp_path, name):
    path = tmp_path / name
    torch.save({'state_dict': twin.state_dict()}, path)
    return str(path)


@pytest.mark.parametrize('name,cfgs,fdim', [
    ('mobilenetv3_large', MNV3_LARGE_CFG, 1280),
    ('mobilenetv3_small', MNV3_SMALL_CFG, 1024),
])
def test_backbone_forward_parity(tmp_path, name, cfgs, fdim):
    twin = _randomized_twin(cfgs, fdim, seed=0)
    path = _save_pth(twin, tmp_path, f'{name}.pth')

    backbone = build_backbone(name)
    x = np.random.RandomState(1).rand(2, 64, 64, 3).astype(np.float32)
    variables = backbone.init(jax.random.PRNGKey(0), jnp.asarray(x))
    params, bs = load_torch_checkpoint_into(
        variables['params'], variables['batch_stats'], path)

    got = np.asarray(backbone.apply({'params': params, 'batch_stats': bs},
                                    jnp.asarray(x), train=False))
    want = twin.forward_features(
        torch.from_numpy(x.transpose(0, 3, 1, 2))).detach().numpy()
    assert got.shape == want.shape == (2, fdim)
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)


def test_pretrained_wiring_through_pipeline(tmp_path):
    """``model.pretrained=<path>`` must reach the initialized TrainState
    (round-1 gap: configs said pretrained=True but nothing consumed it)."""
    from tpudet3d.train.pipeline import setup_training

    twin = _randomized_twin(MNV3_LARGE_CFG, 1280, seed=2)
    path = _save_pth(twin, tmp_path, 'mobilenetv3_large.pth')

    from test_train_e2e import tiny_cfg
    cfg = tiny_cfg(tmp_path, batch=4)
    cfg.model.name = 'mobilenetv3_large'
    cfg.model.pretrained = path
    pipe = setup_training(cfg, with_loaders=False)

    stem = np.asarray(
        pipe.state.params['backbone']['blocks_0']['Conv_0']['kernel'])
    want = twin.features[0].conv.weight.detach().numpy().transpose(2, 3, 1, 0)
    np.testing.assert_allclose(stem, want, atol=1e-6)
    # BN running stats came over too
    bn_mean = np.asarray(
        pipe.state.batch_stats['backbone']['blocks_0']['BatchNorm_0']['mean'])
    np.testing.assert_allclose(
        bn_mean, twin.features[0].bn.running_mean.numpy(), atol=1e-6)


class TorchEffLiteMBConv(tnn.Module):
    """MBConv without SE, ReLU6 — the efficientnet-lite block (reference
    consumes it via the packaged efficientnet_lite_pytorch weights,
    torchdet3d/builders/model_builder.py:19-29)."""

    def __init__(self, inp, out, expand, k, s):
        super().__init__()
        hidden = inp * expand
        self.expand = (TorchConvBN(inp, hidden, 1, 1, act=F.relu6)
                       if expand != 1 else None)
        self.dw = TorchConvBN(hidden, hidden, k, s, groups=hidden,
                              act=F.relu6)
        self.project = TorchConvBN(hidden, out, 1, 1, act=None)
        self.identity = s == 1 and inp == out

    def forward(self, x):
        y = x
        if self.expand is not None:
            y = self.expand(y)
        y = self.project(self.dw(y))
        return x + y if self.identity else y


class TorchEffLite(tnn.Module):
    """Torch twin of tpudet3d.models.efficientnet_lite.EfficientNetLite in
    the published module order: fixed stem(32) → MBConv stages (first/last
    stage depth unscaled, SE-free, ReLU6) → fixed head(1280) → global pool,
    plus an ImageNet classifier the import must skip."""

    def __init__(self, width_mult, depth_mult):
        super().__init__()
        from tpudet3d.models.efficientnet_lite import (
            _B0_STAGES, _round_filters, _round_repeats)
        layers = [TorchConvBN(3, 32, 3, 2, act=F.relu6)]
        in_ch = 32
        n_stages = len(_B0_STAGES)
        for si, (expand, channels, repeats, stride, kernel) in \
                enumerate(_B0_STAGES):
            out_ch = _round_filters(channels, width_mult)
            reps = (repeats if si in (0, n_stages - 1)
                    else _round_repeats(repeats, depth_mult))
            for i in range(reps):
                layers.append(TorchEffLiteMBConv(
                    in_ch, out_ch, expand, kernel, stride if i == 0 else 1))
                in_ch = out_ch
        layers.append(TorchConvBN(in_ch, 1280, 1, 1, act=F.relu6))
        self.features = tnn.Sequential(*layers)
        self.classifier = tnn.Linear(1280, 1000)   # must be skipped

    def forward_features(self, x):
        return self.features(x).mean((2, 3))

    def forward(self, x):
        return self.classifier(self.forward_features(x))


def _randomized_efflite_twin(width_mult, depth_mult, seed):
    torch.manual_seed(seed)
    twin = TorchEffLite(width_mult, depth_mult)
    for m in twin.modules():
        if isinstance(m, tnn.BatchNorm2d):
            m.weight.data.uniform_(0.5, 1.5)
            m.bias.data.uniform_(-0.3, 0.3)
    twin.train()
    with torch.no_grad():
        for _ in range(2):
            twin(torch.randn(4, 3, 64, 64))
    twin.eval()
    return twin


@pytest.mark.parametrize('name', [
    'efficientnet-lite0', 'efficientnet-lite1', 'efficientnet-lite2',
])
def test_efflite_backbone_forward_parity(tmp_path, name):
    """VERDICT r2 item 3: the ordered-shape FIFO matcher proven on the
    efficientnet-lite topology (expand-less first block, repeated stages,
    width/depth multipliers in lite2), not just MNv3."""
    from tpudet3d.models.efficientnet_lite import EFFNET_LITE_PARAMS
    width_mult, depth_mult = EFFNET_LITE_PARAMS[name][:2]
    twin = _randomized_efflite_twin(width_mult, depth_mult, seed=3)
    path = _save_pth(twin, tmp_path, f'{name}.pth')

    backbone = build_backbone(name)
    x = np.random.RandomState(4).rand(2, 64, 64, 3).astype(np.float32)
    variables = backbone.init(jax.random.PRNGKey(0), jnp.asarray(x))
    params, bs = load_torch_checkpoint_into(
        variables['params'], variables['batch_stats'], path)

    got = np.asarray(backbone.apply({'params': params, 'batch_stats': bs},
                                    jnp.asarray(x), train=False))
    want = twin.forward_features(
        torch.from_numpy(x.transpose(0, 3, 1, 2))).detach().numpy()
    assert got.shape == want.shape == (2, 1280)
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)


def test_efflite_pretrained_wiring_through_pipeline(tmp_path):
    """lite0 + pretrained=<path> reaches the TrainState (the reference
    defaults efficientnet-lite to packaged ImageNet weights)."""
    from tpudet3d.train.pipeline import setup_training

    twin = _randomized_efflite_twin(1.0, 1.0, seed=5)
    path = _save_pth(twin, tmp_path, 'efficientnet-lite0.pth')

    from test_train_e2e import tiny_cfg
    cfg = tiny_cfg(tmp_path, batch=4)
    cfg.model.name = 'efficientnet-lite0'
    cfg.model.pretrained = path
    pipe = setup_training(cfg, with_loaders=False)

    stem = np.asarray(
        pipe.state.params['backbone']['blocks_0']['Conv_0']['kernel'])
    want = twin.features[0].conv.weight.detach().numpy().transpose(2, 3, 1, 0)
    np.testing.assert_allclose(stem, want, atol=1e-6)


def test_resolve_pretrained_path(tmp_path, monkeypatch):
    f = tmp_path / 'mobilenetv3_large.pth'
    f.write_bytes(b'x')
    assert resolve_pretrained_path('mobilenetv3_large', str(f)) == str(f)
    assert resolve_pretrained_path('mobilenetv3_large', True) is None
    monkeypatch.setenv('TPUDET3D_PRETRAINED_DIR', str(tmp_path))
    assert resolve_pretrained_path('mobilenetv3_large', True) == str(f)
    assert resolve_pretrained_path('nope', '/does/not/exist.pth') is None
