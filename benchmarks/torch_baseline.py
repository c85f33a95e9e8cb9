"""Reference-equivalent PyTorch-CPU baseline for benchmarking.

The reference publishes no numbers (BASELINE.md), so the baseline is
*measured*: a torch-CPU MobileNetV3-large multi-head regressor driven the
way the reference's deployment drives it — batch size 1, one forward per
detection crop, serial (torchdet3d/utils/ie_wrappers.py:48,61,128-136).

The architecture mirrors the same public MobileNetV3-large schedule used by
our Flax backbone (tpudet3d/models/mobilenetv3.py) so FLOPs match the
reference model family.
"""

import torch
import torch.nn as nn

from tpudet3d.models.mobilenetv3 import MNV3_LARGE_CFG
from tpudet3d.models.layers import make_divisible


class HSwish(nn.Module):
    def forward(self, x):
        return x * nn.functional.relu6(x + 3.0) / 6.0


def conv_bn(cin, cout, k, s, groups=1, act=True):
    layers = [nn.Conv2d(cin, cout, k, s, (k - 1) // 2, groups=groups,
                        bias=False), nn.BatchNorm2d(cout)]
    if act:
        layers.append(HSwish())
    return nn.Sequential(*layers)


class SE(nn.Module):
    def __init__(self, ch):
        super().__init__()
        hidden = make_divisible(ch // 4, 8)
        self.fc = nn.Sequential(nn.Linear(ch, hidden), nn.ReLU(),
                                nn.Linear(hidden, ch))

    def forward(self, x):
        s = x.mean((2, 3))
        s = nn.functional.relu6(self.fc(s) + 3.0) / 6.0
        return x * s[:, :, None, None]


class Block(nn.Module):
    def __init__(self, cin, hidden, cout, k, s, use_se, use_hs):
        super().__init__()
        act = HSwish() if use_hs else nn.ReLU()
        mods = []
        if cin != hidden:
            mods += [conv_bn(cin, hidden, 1, 1, act=False), act]
        mods += [conv_bn(hidden, hidden, k, s, groups=hidden, act=False)]
        if use_se:
            mods += [SE(hidden)]
        mods += [act, conv_bn(hidden, cout, 1, 1, act=False)]
        self.body = nn.Sequential(*mods)
        self.skip = s == 1 and cin == cout

    def forward(self, x):
        y = self.body(x)
        return x + y if self.skip else y


def conv_bn_relu6(cin, cout, k, s, groups=1):
    return nn.Sequential(
        nn.Conv2d(cin, cout, k, s, (k - 1) // 2, groups=groups, bias=False),
        nn.BatchNorm2d(cout), nn.ReLU6())


class _MBConvT(nn.Module):
    def __init__(self, cin, cout, expand, stride):
        super().__init__()
        hidden = cin * expand
        mods = []
        if expand != 1:
            mods.append(conv_bn_relu6(cin, hidden, 1, 1))
        mods.append(conv_bn_relu6(hidden, hidden, 3, stride, groups=hidden))
        mods.append(conv_bn(hidden, cout, 1, 1, act=False))
        self.body = nn.Sequential(*mods)
        self.skip = stride == 1 and cin == cout

    def forward(self, x):
        y = self.body(x)
        return x + y if self.skip else y


class TorchSSDBaseline(nn.Module):
    """MNv2-SSD-300 2-heads (reference detector family) for the CPU
    baseline: stride-16 (96ch) and stride-32 (320ch) features + depthwise
    prediction heads, 4/6 clustered anchors."""

    _CFG = ((1, 16, 1, 1), (6, 24, 2, 2), (6, 32, 3, 2), (6, 64, 4, 2),
            (6, 96, 3, 1), (6, 160, 3, 2), (6, 320, 1, 1))

    def __init__(self, num_classes=9):
        super().__init__()
        cin = 32
        stages = [conv_bn_relu6(3, cin, 3, 2)]
        self.out_at = []
        blocks = []
        for si, (t, c, n, s) in enumerate(self._CFG):
            for i in range(n):
                blocks.append(_MBConvT(cin, c, t, s if i == 0 else 1))
                cin = c
            if si in (4, 6):
                self.out_at.append(len(blocks))
        self.stem = nn.Sequential(*stages)
        self.blocks = nn.ModuleList(blocks)
        heads = []
        for ch, k in ((96, 4), (320, 6)):
            heads.append(nn.ModuleDict({
                'cls': nn.Sequential(conv_bn_relu6(ch, ch, 3, 1, groups=ch),
                                     nn.Conv2d(ch, k * (num_classes + 1), 1)),
                'reg': nn.Sequential(conv_bn_relu6(ch, ch, 3, 1, groups=ch),
                                     nn.Conv2d(ch, k * 4, 1))}))
        self.heads = nn.ModuleList(heads)

    @torch.no_grad()
    def forward(self, x):
        x = self.stem(x)
        feats = []
        for i, block in enumerate(self.blocks):
            x = block(x)
            if i + 1 in self.out_at:
                feats.append(x)
        outs = []
        for feat, head in zip(feats, self.heads):
            outs.append((head['cls'](feat), head['reg'](feat)))
        return outs


class TorchRegressorBaseline(nn.Module):
    """MobileNetV3-large trunk + 9 linear heads + cls head (CPU baseline)."""

    def __init__(self, num_classes=9, feature_dim=1280):
        super().__init__()
        cin = make_divisible(16, 8)
        layers = [conv_bn(3, cin, 3, 2)]
        exp = cin
        for k, t, c, use_se, use_hs, s in MNV3_LARGE_CFG:
            cout = make_divisible(c, 8)
            exp = make_divisible(cin * t, 8)
            layers.append(Block(cin, exp, cout, int(k), int(s), bool(use_se),
                                bool(use_hs)))
            cin = cout
        layers.append(conv_bn(cin, exp, 1, 1))
        self.features = nn.Sequential(*layers)
        self.head = nn.Sequential(nn.Linear(exp, feature_dim),
                                  nn.BatchNorm1d(feature_dim), HSwish())
        self.regressors = nn.Linear(feature_dim, 9 * 18)
        self.cls = nn.Linear(feature_dim, num_classes)

    @torch.no_grad()
    def forward(self, x):
        f = self.features(x).mean((2, 3))
        f = self.head(f)
        kp = torch.sigmoid(self.regressors(f)).view(-1, 9, 9, 2)
        return kp, self.cls(f)
