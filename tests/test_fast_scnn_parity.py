"""Whole-network torch parity for Fast-SCNN (reference
``mmseg/models/backbones/fast_scnn.py``) with transplanted weights.

Covers the three reference subtleties fixed during the parity sweep:
the LTD separable convs carry NO activation on the depthwise conv
(``dw_act_cfg=None`` default, ``fast_scnn.py:38,57-73``), the GFE
inverted residuals use ReLU (not MobileNetV2's ReLU6) because FastSCNN
forwards ``act_cfg`` (``fast_scnn.py:165-182``), and the GFE output conv
is 3x3/pad 1 (``fast_scnn.py:152-158``).
"""
import pytest
import numpy as np
import torch
import torch.nn as tnn
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from lednet_tpu.models.backbones.fast_scnn import FastSCNN

pytestmark = pytest.mark.slow  # whole-network transplant / long-run tier


def _conv_bn(conv, bn, p, s):
    with torch.no_grad():
        conv.weight.copy_(torch.from_numpy(np.transpose(
            np.asarray(p['conv']['kernel']), (3, 2, 0, 1)).copy()))
        if conv.bias is not None:
            conv.bias.copy_(torch.from_numpy(
                np.asarray(p['conv']['bias']).copy()))
        bn.weight.copy_(torch.from_numpy(
            np.asarray(p['norm']['bn']['scale']).copy()))
        bn.bias.copy_(torch.from_numpy(
            np.asarray(p['norm']['bn']['bias']).copy()))
        bn.running_mean.copy_(torch.from_numpy(
            np.asarray(s['norm']['bn']['mean']).copy()))
        bn.running_var.copy_(torch.from_numpy(
            np.asarray(s['norm']['bn']['var']).copy()))
    bn.eval()


class _CBA(tnn.Module):
    """torch conv+BN(+ReLU) mirroring one ConvModule."""

    def __init__(self, cin, cout, k, stride=1, padding=0, groups=1, act=True):
        super().__init__()
        self.conv = tnn.Conv2d(cin, cout, k, stride, padding, groups=groups,
                               bias=False)
        self.bn = tnn.BatchNorm2d(cout)
        self.act = act

    def load(self, p, s):
        _conv_bn(self.conv, self.bn, p, s)

    def forward(self, x):
        x = self.bn(self.conv(x))
        return F.relu(x) if self.act else x


def _torch_ir(p, s, name, cin, cout, stride, x):
    """mmseg InvertedResidual with act=ReLU, expand_ratio=6."""
    mid = cin * 6
    expand = _CBA(cin, mid, 1)
    dw = _CBA(mid, mid, 3, stride, 1, groups=mid)
    project = _CBA(mid, cout, 1, act=False)
    expand.load(p[name]['expand'], s[name]['expand'])
    dw.load(p[name]['dw'], s[name]['dw'])
    project.load(p[name]['project'], s[name]['project'])
    out = project(dw(expand(x)))
    if stride == 1 and cin == cout:
        out = out + x
    return out


def test_fast_scnn_matches_torch_reference(rng):
    x = rng.standard_normal((1, 192, 192, 3)).astype(np.float32)
    mod = FastSCNN()
    variables = mod.init(jax.random.PRNGKey(0), jnp.asarray(x), train=False)

    def rnd(t):
        return jnp.asarray(rng.standard_normal(t.shape).astype(np.float32)
                           * 0.05 + (1.0 if float(t.mean()) > 0.5 else 0.0))
    stats = jax.tree.map(rnd, variables['batch_stats'])
    v = {'params': variables['params'], 'batch_stats': stats}
    higher_j, lower_j, fusion_j = mod.apply(v, jnp.asarray(x), train=False)

    p, s = v['params'], v['batch_stats']
    xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
    with torch.no_grad():
        # Learning to downsample: conv s2 + two separable convs s2.
        # Depthwise convs: BN, NO activation (dw_act_cfg=None default).
        ltd_conv = _CBA(3, 32, 3, 2, 1)
        ltd_conv.load(p['ltd_conv'], s['ltd_conv'])
        h = ltd_conv(xt)
        for name, cin, cout in (('ltd_sep1', 32, 48), ('ltd_sep2', 48, 64)):
            dw = _CBA(cin, cin, 3, 2, 1, groups=cin, act=False)
            pw = _CBA(cin, cout, 1)
            dw.load(p[name]['dw'], s[name]['dw'])
            pw.load(p[name]['pw'], s[name]['pw'])
            h = pw(dw(h))
        higher_t = h

        # Global feature extractor: 3 stages x 3 ReLU inverted residuals.
        g = higher_t
        cin = 64
        for i, (ch, stride) in enumerate(zip((64, 96, 128), (2, 2, 1))):
            for j in range(3):
                g = _torch_ir(p, s, f'gfe{i}_{j}', cin, ch,
                              stride if j == 0 else 1, g)
                cin = ch
        # PPM (scales 1,2,3,6 on the 6x6 map) + 3x3 out conv.
        feats = [g]
        for scale in (1, 2, 3, 6):
            pool = F.adaptive_avg_pool2d(g, scale)
            branch = _CBA(128, 32, 1)
            branch.load(p['ppm'][f'pool{scale}'], s['ppm'][f'pool{scale}'])
            feats.append(F.interpolate(branch(pool), size=g.shape[2:],
                                       mode='bilinear', align_corners=False))
        g = torch.cat(feats, dim=1)
        gfe_out = _CBA(256, 128, 3, 1, 1)
        gfe_out.load(p['gfe_out'], s['gfe_out'])
        lower_t = gfe_out(g)

        # Feature fusion module.
        low = F.interpolate(lower_t, size=higher_t.shape[2:], mode='bilinear',
                            align_corners=False)
        ffm_dw = _CBA(128, 128, 3, 1, 1, groups=128)
        ffm_low = _CBA(128, 128, 1, act=False)
        ffm_high = _CBA(64, 128, 1, act=False)
        ffm_dw.load(p['ffm_dw'], s['ffm_dw'])
        ffm_low.load(p['ffm_low'], s['ffm_low'])
        ffm_high.load(p['ffm_high'], s['ffm_high'])
        fusion_t = F.relu(ffm_low(ffm_dw(low)) + ffm_high(higher_t))

    for j_out, t_out in ((higher_j, higher_t), (lower_j, lower_t),
                         (fusion_j, fusion_t)):
        np.testing.assert_allclose(np.asarray(j_out),
                                   t_out.numpy().transpose(0, 2, 3, 1),
                                   atol=2e-3, rtol=2e-3)
