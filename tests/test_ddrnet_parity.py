"""Whole-backbone numeric parity: flax DDRNet vs a torch implementation of
the reference semantics (``mmseg/models/backbones/ddrnet.py:35-224``) with
every weight transplanted. Passing this pins the composed
conv/BN/residual/DAPPM/bilinear stack end-to-end (BASELINE 'logit-level
fidelity' for the fully-specified family)."""
import numpy as np
import pytest
import torch
import torch.nn as tnn
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from lednet_tpu.registry import MODELS
import lednet_tpu.models  # noqa: F401

C = 8  # base channels (small for test speed)


def convbn(cin, cout, k, s=1, p=0, act=False):
    layers = [tnn.Conv2d(cin, cout, k, s, p, bias=False),
              tnn.BatchNorm2d(cout)]
    if act:
        layers.append(tnn.ReLU())
    return tnn.Sequential(*layers)


class TBasic(tnn.Module):
    def __init__(self, cin, ch, stride=1, down=False, act_out=True):
        super().__init__()
        self.conv1 = convbn(cin, ch, 3, stride, 1, act=True)
        self.conv2 = convbn(ch, ch, 3, 1, 1)
        self.down = convbn(cin, ch, 1, stride) if down else None
        self.act_out = act_out

    def forward(self, x):
        r = self.down(x) if self.down is not None else x
        out = self.conv2(self.conv1(x)) + r
        return F.relu(out) if self.act_out else out


class TBottle(tnn.Module):
    def __init__(self, cin, ch, stride=1, down=False, act_out=False):
        super().__init__()
        self.conv1 = convbn(cin, ch, 1, act=True)
        self.conv2 = convbn(ch, ch, 3, stride, 1, act=True)
        self.conv3 = convbn(ch, 2 * ch, 1)
        self.down = convbn(cin, 2 * ch, 1, stride) if down else None
        self.act_out = act_out

    def forward(self, x):
        r = self.down(x) if self.down is not None else x
        out = self.conv3(self.conv2(self.conv1(x))) + r
        return F.relu(out) if self.act_out else out


class TDAPPM(tnn.Module):
    def __init__(self, cin, branch, cout, scales=5):
        super().__init__()
        self.scales = scales

        def pre(cin_, cout_, k):
            return tnn.Sequential(tnn.BatchNorm2d(cin_), tnn.ReLU(),
                                  tnn.Conv2d(cin_, cout_, k,
                                             padding=k // 2, bias=False))
        self.scale0 = pre(cin, branch, 1)
        self.pools = tnn.ModuleList([
            tnn.AvgPool2d(5, 2, 2), tnn.AvgPool2d(9, 4, 4),
            tnn.AvgPool2d(17, 8, 8)])
        self.scale_convs = tnn.ModuleList(
            [pre(cin, branch, 1) for _ in range(scales - 1)])
        self.processes = tnn.ModuleList(
            [pre(branch, branch, 3) for _ in range(scales - 1)])
        self.compression = pre(branch * scales, cout, 1)
        self.shortcut = pre(cin, cout, 1)

    def forward(self, x):
        size = x.shape[2:]
        feats = [self.scale0(x)]
        for i in range(1, self.scales):
            pooled = self.pools[i - 1](x) if i < self.scales - 1 \
                else F.adaptive_avg_pool2d(x, 1)
            up = F.interpolate(self.scale_convs[i - 1](pooled), size,
                               mode='bilinear', align_corners=False)
            feats.append(self.processes[i - 1](up + feats[i - 1]))
        return self.compression(torch.cat(feats, 1)) + self.shortcut(x)


class TDDRNet(tnn.Module):
    def __init__(self, c=C, ppm=16):
        super().__init__()
        self.stem_conv1 = convbn(3, c, 3, 2, 1, act=True)
        self.stem_conv2 = convbn(c, c, 3, 2, 1, act=True)
        self.stem_l1 = tnn.ModuleList([TBasic(c, c, act_out=True),
                                       TBasic(c, c, act_out=False)])
        self.stem_l2 = tnn.ModuleList([TBasic(c, 2 * c, 2, down=True,
                                              act_out=True),
                                       TBasic(2 * c, 2 * c, act_out=False)])
        self.ctx1 = tnn.ModuleList([TBasic(2 * c, 4 * c, 2, down=True,
                                           act_out=True),
                                    TBasic(4 * c, 4 * c, act_out=False)])
        self.sp1 = tnn.ModuleList([TBasic(2 * c, 2 * c, act_out=True),
                                   TBasic(2 * c, 2 * c, act_out=False)])
        self.comp1 = convbn(4 * c, 2 * c, 1)
        self.down1 = convbn(2 * c, 4 * c, 3, 2, 1)
        self.ctx2 = tnn.ModuleList([TBasic(4 * c, 8 * c, 2, down=True,
                                           act_out=True),
                                    TBasic(8 * c, 8 * c, act_out=False)])
        self.sp2 = tnn.ModuleList([TBasic(2 * c, 2 * c, act_out=True),
                                   TBasic(2 * c, 2 * c, act_out=False)])
        self.comp2 = convbn(8 * c, 2 * c, 1)
        self.down2a = convbn(2 * c, 4 * c, 3, 2, 1, act=True)
        self.down2b = convbn(4 * c, 8 * c, 3, 2, 1)
        self.sp3 = TBottle(2 * c, 2 * c, down=True)
        self.ctx3 = TBottle(8 * c, 8 * c, 2, down=True)
        self.spp = TDAPPM(16 * c, ppm, 4 * c)

    def forward(self, x):
        import math
        size = (math.ceil(x.shape[-2] / 8), math.ceil(x.shape[-1] / 8))
        h = self.stem_conv2(self.stem_conv1(x))
        for m in self.stem_l1:
            h = m(h)
        h = F.relu(h)
        for m in self.stem_l2:
            h = m(h)
        stem = F.relu(h)
        x_c = stem
        for m in self.ctx1:
            x_c = m(x_c)
        x_s = stem
        for m in self.sp1:
            x_s = m(x_s)
        comp = self.comp1(F.relu(x_c))
        x_c = x_c + self.down1(F.relu(x_s))
        x_s = x_s + F.interpolate(comp, size, mode='bilinear',
                                  align_corners=False)
        temp = x_s
        xc2 = F.relu(x_c)
        for m in self.ctx2:
            xc2 = m(xc2)
        xs2 = F.relu(x_s)
        for m in self.sp2:
            xs2 = m(xs2)
        comp = self.comp2(F.relu(xc2))
        xc2 = xc2 + self.down2b(self.down2a(F.relu(xs2)))
        xs2 = xs2 + F.interpolate(comp, size, mode='bilinear',
                                  align_corners=False)
        xs3 = self.sp3(F.relu(xs2))
        xc3 = self.ctx3(F.relu(xc2))
        xc3 = F.interpolate(self.spp(xc3), size, mode='bilinear',
                            align_corners=False)
        return temp, xs3 + xc3


def _copy_convbn(dst, params, stats=None):
    """dst torch Sequential(conv, bn[, relu]); params flax ConvModule dict."""
    with torch.no_grad():
        dst[0].weight.copy_(torch.from_numpy(np.transpose(
            np.asarray(params['conv']['kernel']), (3, 2, 0, 1)).copy()))
        bnp = params['norm']['bn']
        dst[1].weight.copy_(torch.from_numpy(np.asarray(bnp['scale']).copy()))
        dst[1].bias.copy_(torch.from_numpy(np.asarray(bnp['bias']).copy()))
        if stats is not None:
            bns = stats['norm']['bn']
            dst[1].running_mean.copy_(torch.from_numpy(
                np.asarray(bns['mean']).copy()))
            dst[1].running_var.copy_(torch.from_numpy(
                np.asarray(bns['var']).copy()))


def _copy_plain(dst_conv, dst_bn, p_conv, p_norm, s_norm):
    with torch.no_grad():
        dst_conv.weight.copy_(torch.from_numpy(np.transpose(
            np.asarray(p_conv['kernel']), (3, 2, 0, 1)).copy()))
        dst_bn.weight.copy_(torch.from_numpy(
            np.asarray(p_norm['bn']['scale']).copy()))
        dst_bn.bias.copy_(torch.from_numpy(
            np.asarray(p_norm['bn']['bias']).copy()))
        dst_bn.running_mean.copy_(torch.from_numpy(
            np.asarray(s_norm['bn']['mean']).copy()))
        dst_bn.running_var.copy_(torch.from_numpy(
            np.asarray(s_norm['bn']['var']).copy()))


def _copy_block(tblock, p, s):
    _copy_convbn(tblock.conv1, p['conv1'], s['conv1'])
    _copy_convbn(tblock.conv2, p['conv2'], s['conv2'])
    if getattr(tblock, 'down', None) is not None:
        _copy_plain(tblock.down[0], tblock.down[1], p['downsample_conv'],
                    p['downsample_norm'], s['downsample_norm'])
    if hasattr(tblock, 'conv3'):
        _copy_convbn(tblock.conv3, p['conv3'], s['conv3'])


def test_ddrnet_full_parity(rng):
    model = MODELS.build(dict(type='DDRNet', channels=C, ppm_channels=2 * C))
    x = rng.standard_normal((1, 64, 96, 3)).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x), train=False)
    # randomize batch stats so BN eval is non-trivial
    def rnd(t):
        return jnp.asarray(rng.standard_normal(t.shape).astype(np.float32)
                           * 0.05 + (1.0 if t.mean() > 0.5 else 0.0))
    stats = jax.tree.map(rnd, variables['batch_stats'])
    variables = {'params': variables['params'], 'batch_stats': stats}
    temp_j, out_j = model.apply(variables, jnp.asarray(x), train=False)

    p = jax.device_get(variables['params'])
    s = jax.device_get(variables['batch_stats'])
    t = TDDRNet()
    _copy_convbn(t.stem_conv1, p['stem_conv1'], s['stem_conv1'])
    _copy_convbn(t.stem_conv2, p['stem_conv2'], s['stem_conv2'])
    for i in range(2):
        _copy_block(t.stem_l1[i], p['stem_layer1'][f'block{i}'],
                    s['stem_layer1'][f'block{i}'])
        _copy_block(t.stem_l2[i], p['stem_layer2'][f'block{i}'],
                    s['stem_layer2'][f'block{i}'])
        _copy_block(t.ctx1[i], p['context1'][f'block{i}'],
                    s['context1'][f'block{i}'])
        _copy_block(t.sp1[i], p['spatial1'][f'block{i}'],
                    s['spatial1'][f'block{i}'])
        _copy_block(t.ctx2[i], p['context2'][f'block{i}'],
                    s['context2'][f'block{i}'])
        _copy_block(t.sp2[i], p['spatial2'][f'block{i}'],
                    s['spatial2'][f'block{i}'])
    _copy_convbn(t.comp1, p['compression_1'], s['compression_1'])
    _copy_convbn(t.down1, p['down_1'], s['down_1'])
    _copy_convbn(t.comp2, p['compression_2'], s['compression_2'])
    _copy_convbn(t.down2a, p['down_2a'], s['down_2a'])
    _copy_convbn(t.down2b, p['down_2b'], s['down_2b'])
    _copy_block(t.sp3, p['spatial3']['block0'], s['spatial3']['block0'])
    _copy_block(t.ctx3, p['context3']['block0'], s['context3']['block0'])

    def copy_pre(dst, pp, ss):  # BN->ReLU->conv blocks of DAPPM
        with torch.no_grad():
            dst[0].weight.copy_(torch.from_numpy(
                np.asarray(pp['norm']['bn']['scale']).copy()))
            dst[0].bias.copy_(torch.from_numpy(
                np.asarray(pp['norm']['bn']['bias']).copy()))
            dst[0].running_mean.copy_(torch.from_numpy(
                np.asarray(ss['norm']['bn']['mean']).copy()))
            dst[0].running_var.copy_(torch.from_numpy(
                np.asarray(ss['norm']['bn']['var']).copy()))
            dst[2].weight.copy_(torch.from_numpy(np.transpose(
                np.asarray(pp['conv']['kernel']), (3, 2, 0, 1)).copy()))

    copy_pre(t.spp.scale0, p['spp']['scale0'], s['spp']['scale0'])
    for i in range(1, 5):
        copy_pre(t.spp.scale_convs[i - 1], p['spp'][f'scale{i}'],
                 s['spp'][f'scale{i}'])
        copy_pre(t.spp.processes[i - 1], p['spp'][f'process{i - 1}'],
                 s['spp'][f'process{i - 1}'])
    copy_pre(t.spp.compression, p['spp']['compression'],
             s['spp']['compression'])
    copy_pre(t.spp.shortcut, p['spp']['shortcut'], s['spp']['shortcut'])

    t.eval()
    with torch.no_grad():
        temp_t, out_t = t(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    temp_t = temp_t.numpy().transpose(0, 2, 3, 1)
    out_t = out_t.numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(np.asarray(temp_j), temp_t, atol=1e-3,
                               rtol=1e-3)
    np.testing.assert_allclose(np.asarray(out_j), out_t, atol=1e-3, rtol=1e-3)
