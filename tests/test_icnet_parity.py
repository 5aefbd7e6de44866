"""Whole-network torch transplant parity for ICNet.

Mirrors the reference (``mmseg/models/backbones/icnet.py:12-166``): light
3-conv sub1 branch, ResNetV1c stem+layer1/2 on a 0.5x input (stem maxpool
forced to ceil_mode), layer3/4 RE-ENTERED on a further 0.5x of the sub2
feature, PPM (pool scales 1/2/3/6, outputs-then-x concat order) + 3x3
bottleneck, and the three 1x1/3x3 projection convs. Round-1's late parity
sweep found real bugs here (approximated re-entry, missing PPM convs and
conv_sub2/4) — this pins the fixed behavior end-to-end.
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

from test_ddrnet_parity import _copy_plain
from test_resnet_parity import STAGE_BLOCKS, TResNet, _transplant

pytestmark = pytest.mark.slow  # whole-network transplant / long-run tier

C = 16  # resnet base_channels


def _cbr(cin, cout, k, stride=1, padding=0):
    return tnn.Sequential(
        tnn.Conv2d(cin, cout, k, stride=stride, padding=padding, bias=False),
        tnn.BatchNorm2d(cout), tnn.ReLU())


class TICNet(tnn.Module):
    def __init__(self, mid=8, psp=64, out=(16, 32, 32)):
        super().__init__()
        self.backbone = TResNet(deep_stem=True)  # d8 V1c mirror
        self.sub1 = tnn.ModuleList([_cbr(3, mid, 3, 2, 1),
                                    _cbr(mid, mid, 3, 2, 1),
                                    _cbr(mid, out[0], 3, 2, 1)])
        deep_ch = C * 8 * 4
        self.ppm = tnn.ModuleList([_cbr(deep_ch, psp, 1) for _ in range(4)])
        self.bottleneck = _cbr(deep_ch + 4 * psp, psp, 3, 1, 1)
        self.conv_sub2 = _cbr(C * 2 * 4, out[1], 1)
        self.conv_sub4 = _cbr(psp, out[2], 1)

    def forward(self, x):
        s1 = x
        for m in self.sub1:
            s1 = m(s1)
        x = F.interpolate(x, scale_factor=0.5, mode='bilinear',
                          align_corners=False)
        x = self.backbone.stem(x)
        x = F.max_pool2d(x, 3, stride=2, padding=1, ceil_mode=True)
        for b in self.backbone.layers[0]:
            x = b(x)
        for b in self.backbone.layers[1]:
            x = b(x)
        s2 = self.conv_sub2(x)
        x = F.interpolate(x, scale_factor=0.5, mode='bilinear',
                          align_corners=False)
        for b in self.backbone.layers[2]:
            x = b(x)
        for b in self.backbone.layers[3]:
            x = b(x)
        size = x.shape[2:]
        ppm_outs = []
        for scale, m in zip((1, 2, 3, 6), self.ppm):
            p = m(F.adaptive_avg_pool2d(x, scale))
            ppm_outs.append(F.interpolate(p, size, mode='bilinear',
                                          align_corners=False))
        x = self.bottleneck(torch.cat(ppm_outs + [x], dim=1))
        return s1, s2, self.conv_sub4(x)


def test_icnet_full_parity(rng):
    model = MODELS.build(dict(
        type='ICNet',
        backbone_cfg=dict(type='ResNetV1c', depth=50, stem_channels=C,
                          base_channels=C, strides=(1, 2, 1, 1),
                          dilations=(1, 1, 2, 4), contract_dilation=True,
                          out_indices=(0, 1, 2, 3)),
        layer_channels=(C * 2 * 4, C * 8 * 4), psp_out_channels=64,
        out_channels=(16, 32, 32), light_branch_middle_channels=8))
    x = rng.standard_normal((1, 64, 96, 3)).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x), train=False)

    def rnd(t):
        return jnp.asarray(rng.standard_normal(t.shape).astype(np.float32)
                           * 0.05 + float(t.mean() > 0.5))
    stats = jax.tree.map(rnd, variables['batch_stats'])
    variables = {'params': variables['params'], 'batch_stats': stats}
    outs_j = model.apply(variables, jnp.asarray(x), train=False)

    p = jax.device_get(variables['params'])
    s = jax.device_get(variables['batch_stats'])
    tm = TICNet()
    _transplant(tm.backbone, p['ResNetV1c_0'], s['ResNetV1c_0'],
                deep_stem=True)
    for k in range(3):
        _copy_plain(tm.sub1[k][0], tm.sub1[k][1],
                    p[f'sub1_conv{k + 1}']['conv'],
                    p[f'sub1_conv{k + 1}']['norm'],
                    s[f'sub1_conv{k + 1}']['norm'])
    for k in range(4):
        _copy_plain(tm.ppm[k][0], tm.ppm[k][1], p[f'ppm{k}']['conv'],
                    p[f'ppm{k}']['norm'], s[f'ppm{k}']['norm'])
    _copy_plain(tm.bottleneck[0], tm.bottleneck[1],
                p['psp_bottleneck']['conv'], p['psp_bottleneck']['norm'],
                s['psp_bottleneck']['norm'])
    _copy_plain(tm.conv_sub2[0], tm.conv_sub2[1], p['conv_sub2']['conv'],
                p['conv_sub2']['norm'], s['conv_sub2']['norm'])
    _copy_plain(tm.conv_sub4[0], tm.conv_sub4[1], p['conv_sub4']['conv'],
                p['conv_sub4']['norm'], s['conv_sub4']['norm'])

    tm.eval()
    with torch.no_grad():
        outs_t = tm(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    for k, (a, b) in enumerate(zip(outs_j, outs_t)):
        np.testing.assert_allclose(
            np.asarray(a), b.numpy().transpose(0, 2, 3, 1),
            atol=2e-4, rtol=1e-3, err_msg=f'branch {k}')
