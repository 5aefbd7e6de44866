"""Whole-network torch transplant parity for U^2-Net (U2NETP variant).

Mirrors the reference's in-tree ``mmseg/models/backbones/u2net.py`` (an
unregistered plain nn.Module upstream): RSU-L nested U blocks with
ceil-mode 2x2 pools and dilated bottoms, RSU4F dilation pyramids, the
6-stage encoder/5-stage decoder, 6 side heads + fused 1x1, sigmoid outputs.
All 7 outputs must match a torch mirror after jax->torch transplant.
"""
import numpy as np
import torch
import torch.nn as tnn
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from lednet_tpu.registry import MODELS
import lednet_tpu.models  # noqa: F401

MID, OUT = 16, 64


class TRebnconv(tnn.Module):
    def __init__(self, cin, cout, d=1):
        super().__init__()
        self.conv = tnn.Conv2d(cin, cout, 3, padding=d, dilation=d)
        self.bn = tnn.BatchNorm2d(cout)

    def forward(self, x):
        return F.relu(self.bn(self.conv(x)))


def _up(x, ref):
    return F.interpolate(x, ref.shape[2:], mode='bilinear',
                         align_corners=False)


class TRSU(tnn.Module):
    def __init__(self, L, cin, mid=MID, out=OUT):
        super().__init__()
        self.L = L
        self.rebnconvin = TRebnconv(cin, out)
        self.enc = tnn.ModuleList(
            [TRebnconv(out if i == 1 else mid, mid) for i in range(1, L)])
        self.bottom = TRebnconv(mid, mid, d=2)
        self.dec = tnn.ModuleList(
            [TRebnconv(2 * mid, out if i == 1 else mid)
             for i in range(L - 1, 0, -1)])

    def forward(self, x):
        hxin = self.rebnconvin(x)
        enc, h = [], hxin
        for i, m in enumerate(self.enc):
            h = m(h)
            enc.append(h)
            if i < len(self.enc) - 1:
                h = F.max_pool2d(h, 2, stride=2, ceil_mode=True)
        d = self.bottom(enc[-1])
        for j, m in enumerate(self.dec):
            i = self.L - 1 - j
            d = m(torch.cat([d, enc[i - 1]], dim=1))
            if i > 1:
                d = _up(d, enc[i - 2])
        return d + hxin


class TRSU4F(tnn.Module):
    def __init__(self, cin, mid=MID, out=OUT):
        super().__init__()
        self.rebnconvin = TRebnconv(cin, out)
        self.c1 = TRebnconv(out, mid, 1)
        self.c2 = TRebnconv(mid, mid, 2)
        self.c3 = TRebnconv(mid, mid, 4)
        self.c4 = TRebnconv(mid, mid, 8)
        self.d3 = TRebnconv(2 * mid, mid, 4)
        self.d2 = TRebnconv(2 * mid, mid, 2)
        self.d1 = TRebnconv(2 * mid, out, 1)

    def forward(self, x):
        hxin = self.rebnconvin(x)
        h1 = self.c1(hxin)
        h2 = self.c2(h1)
        h3 = self.c3(h2)
        h4 = self.c4(h3)
        d3 = self.d3(torch.cat([h4, h3], dim=1))
        d2 = self.d2(torch.cat([d3, h2], dim=1))
        d1 = self.d1(torch.cat([d2, h1], dim=1))
        return d1 + hxin


class TU2NetP(tnn.Module):
    def __init__(self):
        super().__init__()
        self.stages = tnn.ModuleList([
            TRSU(7, 3), TRSU(6, OUT), TRSU(5, OUT), TRSU(4, OUT),
            TRSU4F(OUT), TRSU4F(OUT)])
        self.dstages = tnn.ModuleList([
            TRSU4F(2 * OUT), TRSU(4, 2 * OUT), TRSU(5, 2 * OUT),
            TRSU(6, 2 * OUT), TRSU(7, 2 * OUT)])
        self.sides = tnn.ModuleList(
            [tnn.Conv2d(OUT, 1, 3, padding=1) for _ in range(6)])
        self.outconv = tnn.Conv2d(6, 1, 1)

    def forward(self, x):
        feats, h = [], x
        for i, m in enumerate(self.stages):
            h = m(h)
            feats.append(h)
            if i < len(self.stages) - 1:
                h = F.max_pool2d(h, 2, stride=2, ceil_mode=True)
        dec = [feats[-1]]
        d = _up(feats[-1], feats[-2])
        for j, m in enumerate(self.dstages):
            d = m(torch.cat([d, feats[4 - j]], dim=1))
            dec.insert(0, d)
            if j < len(self.dstages) - 1:
                d = _up(d, feats[3 - j])
        sides = []
        for i, (f, m) in enumerate(zip(dec, self.sides)):
            s = m(f)
            if s.shape[2:] != dec[0].shape[2:]:
                s = _up(s, dec[0])
            sides.append(s)
        d0 = self.outconv(torch.cat(sides, dim=1))
        return [torch.sigmoid(v) for v in [d0] + sides]


def _copy_reb(tm, p, s):
    with torch.no_grad():
        tm.conv.weight.copy_(torch.from_numpy(np.transpose(
            np.asarray(p['conv']['kernel']), (3, 2, 0, 1)).copy()))
        tm.conv.bias.copy_(torch.from_numpy(
            np.asarray(p['conv']['bias']).copy()))
        tm.bn.weight.copy_(torch.from_numpy(np.asarray(p['bn']['scale']).copy()))
        tm.bn.bias.copy_(torch.from_numpy(np.asarray(p['bn']['bias']).copy()))
        tm.bn.running_mean.copy_(torch.from_numpy(
            np.asarray(s['bn']['mean']).copy()))
        tm.bn.running_var.copy_(torch.from_numpy(
            np.asarray(s['bn']['var']).copy()))


def _copy_rsu(tm, p, s):
    _copy_reb(tm.rebnconvin, p['rebnconvin'], s['rebnconvin'])
    if isinstance(tm, TRSU4F):
        for name, dst in (('rebnconv1', tm.c1), ('rebnconv2', tm.c2),
                          ('rebnconv3', tm.c3), ('rebnconv4', tm.c4),
                          ('rebnconv3d', tm.d3), ('rebnconv2d', tm.d2),
                          ('rebnconv1d', tm.d1)):
            _copy_reb(dst, p[name], s[name])
    else:
        for i, dst in enumerate(tm.enc, start=1):
            _copy_reb(dst, p[f'rebnconv{i}'], s[f'rebnconv{i}'])
        _copy_reb(tm.bottom, p[f'rebnconv{tm.L}'], s[f'rebnconv{tm.L}'])
        for j, dst in enumerate(tm.dec):
            i = tm.L - 1 - j
            _copy_reb(dst, p[f'rebnconv{i}d'], s[f'rebnconv{i}d'])


def test_u2netp_full_parity(rng):
    model = MODELS.build(dict(type='U2Net', small=True))
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
    tm = TU2NetP()
    for i in range(6):
        _copy_rsu(tm.stages[i], p[f'stage{i + 1}'], s[f'stage{i + 1}'])
    for j in range(5):
        _copy_rsu(tm.dstages[j], p[f'stage{5 - j}d'], s[f'stage{5 - j}d'])
    with torch.no_grad():
        for i in range(6):
            tm.sides[i].weight.copy_(torch.from_numpy(np.transpose(
                np.asarray(p[f'side{i + 1}']['kernel']), (3, 2, 0, 1)).copy()))
            tm.sides[i].bias.copy_(torch.from_numpy(
                np.asarray(p[f'side{i + 1}']['bias']).copy()))
        tm.outconv.weight.copy_(torch.from_numpy(np.transpose(
            np.asarray(p['outconv']['kernel']), (3, 2, 0, 1)).copy()))
        tm.outconv.bias.copy_(torch.from_numpy(
            np.asarray(p['outconv']['bias']).copy()))

    tm.eval()
    with torch.no_grad():
        outs_t = tm(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    assert len(outs_j) == 7 and len(outs_t) == 7
    for k, (a, b) in enumerate(zip(outs_j, outs_t)):
        np.testing.assert_allclose(
            np.asarray(a), b.numpy().transpose(0, 2, 3, 1),
            atol=5e-4, rtol=1e-3, err_msg=f'd{k}')
