"""Whole-network torch transplant parity for the ResNet zoo backbone.

The most-used zoo backbone (fcn/psp/aspp/ocr/... configs build on
ResNetV1c-d8). Mirrors the reference semantics (``mmseg/models/backbones/
resnet.py`` + mmcv ``ResLayer``): pytorch-style Bottleneck (stride on the
3x3), d8 dilation schedule strides (1,2,1,1) / dilations (1,1,2,4) with
``contract_dilation`` halving the first dilated block's rate, 7x7 stem and
V1c deep stem. Weights transplant jax->torch; eval outputs of all four
stages must match.
"""
import pytest
import numpy as np
import torch
import torch.nn as tnn
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from lednet_tpu.registry import MODELS
import lednet_tpu.models  # noqa: F401

from test_ddrnet_parity import _copy_convbn, _copy_plain

pytestmark = pytest.mark.slow  # whole-network transplant / long-run tier

C = 16  # base_channels (shrunk; structure identical to base 64)
DEPTH = 50
STAGE_BLOCKS = (3, 4, 6, 3)


class TBottleneck(tnn.Module):
    expansion = 4

    def __init__(self, cin, planes, stride=1, dilation=1, down=False):
        super().__init__()
        self.conv1 = tnn.Sequential(
            tnn.Conv2d(cin, planes, 1, bias=False), tnn.BatchNorm2d(planes))
        self.conv2 = tnn.Sequential(
            tnn.Conv2d(planes, planes, 3, stride=stride, padding=dilation,
                       dilation=dilation, bias=False),
            tnn.BatchNorm2d(planes))
        self.conv3 = tnn.Sequential(
            tnn.Conv2d(planes, planes * 4, 1, bias=False),
            tnn.BatchNorm2d(planes * 4))
        self.down = tnn.Sequential(
            tnn.Conv2d(cin, planes * 4, 1, stride=stride, bias=False),
            tnn.BatchNorm2d(planes * 4)) if down else None

    def forward(self, x):
        idt = x if self.down is None else self.down(x)
        out = F.relu(self.conv1(x))
        out = F.relu(self.conv2(out))
        out = self.conv3(out)
        return F.relu(out + idt)


class TResNet(tnn.Module):
    def __init__(self, deep_stem=False, strides=(1, 2, 1, 1),
                 dilations=(1, 1, 2, 4), contract=True):
        super().__init__()
        if deep_stem:
            mid = C // 2
            self.stem = tnn.Sequential(
                tnn.Conv2d(3, mid, 3, stride=2, padding=1, bias=False),
                tnn.BatchNorm2d(mid), tnn.ReLU(),
                tnn.Conv2d(mid, mid, 3, padding=1, bias=False),
                tnn.BatchNorm2d(mid), tnn.ReLU(),
                tnn.Conv2d(mid, C, 3, padding=1, bias=False),
                tnn.BatchNorm2d(C), tnn.ReLU())
        else:
            self.stem = tnn.Sequential(
                tnn.Conv2d(3, C, 7, stride=2, padding=3, bias=False),
                tnn.BatchNorm2d(C), tnn.ReLU())
        self.deep_stem = deep_stem
        self.layers = tnn.ModuleList()
        cin = C
        for i in range(4):
            planes = C * 2 ** i
            blocks = tnn.ModuleList()
            for j in range(STAGE_BLOCKS[i]):
                d = dilations[i]
                if j == 0 and d > 1 and contract:
                    d = d // 2
                s = strides[i] if j == 0 else 1
                need = (s != 1 or cin != planes * 4)
                blocks.append(TBottleneck(cin, planes, s, d, need))
                cin = planes * 4
            self.layers.append(blocks)

    def forward(self, x):
        x = self.stem(x)
        x = F.max_pool2d(x, 3, stride=2, padding=1)
        outs = []
        for blocks in self.layers:
            for b in blocks:
                x = b(x)
            outs.append(x)
        return outs


def _transplant(tm, p, s, deep_stem):
    if deep_stem:
        for k in range(3):
            _copy_plain(tm.stem[3 * k], tm.stem[3 * k + 1],
                        p[f'stem{k + 1}']['conv'], p[f'stem{k + 1}']['norm'],
                        s[f'stem{k + 1}']['norm'])
    else:
        _copy_plain(tm.stem[0], tm.stem[1], p['stem']['conv'],
                    p['stem']['norm'], s['stem']['norm'])
    for i in range(4):
        for j in range(STAGE_BLOCKS[i]):
            bp, bs = p[f'layer{i + 1}_{j}'], s[f'layer{i + 1}_{j}']
            tb = tm.layers[i][j]
            _copy_convbn(tb.conv1, bp['conv1'], bs['conv1'])
            _copy_convbn(tb.conv2, bp['conv2'], bs['conv2'])
            _copy_convbn(tb.conv3, bp['conv3'], bs['conv3'])
            if tb.down is not None:
                _copy_plain(tb.down[0], tb.down[1], bp['downsample_conv'],
                            bp['downsample_norm'], bs['downsample_norm'])


def _run(rng, model_cfg, deep_stem):
    model = MODELS.build(model_cfg)
    x = rng.standard_normal((1, 63, 97, 3)).astype(np.float32)  # odd sizes
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x), train=False)

    def rnd(t):
        return jnp.asarray(rng.standard_normal(t.shape).astype(np.float32)
                           * 0.05 + float(t.mean() > 0.5))
    stats = jax.tree.map(rnd, variables['batch_stats'])
    variables = {'params': variables['params'], 'batch_stats': stats}
    outs_j = model.apply(variables, jnp.asarray(x), train=False)

    tm = TResNet(deep_stem=deep_stem)
    _transplant(tm, jax.device_get(variables['params']),
                jax.device_get(variables['batch_stats']), deep_stem)
    tm.eval()
    with torch.no_grad():
        outs_t = tm(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    assert len(outs_j) == 4
    for k, (a, b) in enumerate(zip(outs_j, outs_t)):
        np.testing.assert_allclose(
            np.asarray(a), b.numpy().transpose(0, 2, 3, 1),
            atol=2e-4, rtol=1e-3, err_msg=f'stage {k}')


def test_resnet50_d8_full_parity(rng):
    _run(rng, dict(type='ResNet', depth=DEPTH, stem_channels=C,
                   base_channels=C, strides=(1, 2, 1, 1),
                   dilations=(1, 1, 2, 4), contract_dilation=True,
                   out_indices=(0, 1, 2, 3)), deep_stem=False)


def test_resnetv1c_d8_full_parity(rng):
    _run(rng, dict(type='ResNetV1c', depth=DEPTH, stem_channels=C,
                   base_channels=C, strides=(1, 2, 1, 1),
                   dilations=(1, 1, 2, 4), contract_dilation=True,
                   out_indices=(0, 1, 2, 3)), deep_stem=True)
