"""Whole-network torch parity for BiSeNetV1 (reference
``mmseg/models/backbones/bisenetv1.py:11-332``) with transplanted weights.

Exercises in one shot: the full ResNet-18 context-path backbone (stem 7x7 +
maxpool + 4 basic-block stages — the first whole-ResNet torch-parity check),
the ARM channel attention (norm'd 1x1 conv, NO activation,
``bisenetv1.py:111-120``), the FFM attention (ReLU *kept* on the attention
conv, ``bisenetv1.py:242-252``), the global-context broadcast add
(``bisenetv1.py:198-201``), and torch-legacy 'nearest' upsampling down the
pyramid (``bisenetv1.py:202,207``).
"""
import pytest
import numpy as np
import torch
import torch.nn as tnn
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from lednet_tpu.registry import MODELS
import lednet_tpu

pytestmark = pytest.mark.slow  # whole-network transplant / long-run tier

lednet_tpu.register_all_modules()


def _load_conv_bn(conv, bn, p, s):
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

    def __init__(self, cin, cout, k, stride=1, padding=0, act=True, groups=1):
        super().__init__()
        self.conv = tnn.Conv2d(cin, cout, k, stride, padding, groups=groups,
                               bias=False)
        self.bn = tnn.BatchNorm2d(cout)
        self.act = act

    def load(self, p, s):
        _load_conv_bn(self.conv, self.bn, p, s)

    def forward(self, x):
        x = self.bn(self.conv(x))
        return F.relu(x) if self.act else x


def _basic_block(p, s, name, cin, cout, stride, x):
    """mmcv ResNet BasicBlock (style='pytorch')."""
    conv1 = _CBA(cin, cout, 3, stride, 1)
    conv2 = _CBA(cout, cout, 3, 1, 1, act=False)
    conv1.load(p[name]['conv1'], s[name]['conv1'])
    conv2.load(p[name]['conv2'], s[name]['conv2'])
    out = conv2(conv1(x))
    if stride != 1 or cin != cout:
        down = tnn.Conv2d(cin, cout, 1, stride, bias=False)
        dbn = tnn.BatchNorm2d(cout)
        with torch.no_grad():
            down.weight.copy_(torch.from_numpy(np.transpose(
                np.asarray(p[name]['downsample_conv']['kernel']),
                (3, 2, 0, 1)).copy()))
            dbn.weight.copy_(torch.from_numpy(
                np.asarray(p[name]['downsample_norm']['bn']['scale']).copy()))
            dbn.bias.copy_(torch.from_numpy(
                np.asarray(p[name]['downsample_norm']['bn']['bias']).copy()))
            dbn.running_mean.copy_(torch.from_numpy(
                np.asarray(s[name]['downsample_norm']['bn']['mean']).copy()))
            dbn.running_var.copy_(torch.from_numpy(
                np.asarray(s[name]['downsample_norm']['bn']['var']).copy()))
        dbn.eval()
        identity = dbn(down(x))
    else:
        identity = x
    return F.relu(out + identity)


def _arm(p, s, cin, x):
    """AttentionRefinementModule: 3x3 conv + (gap -> norm'd 1x1, no act,
    sigmoid) gate (``bisenetv1.py:102-126``)."""
    conv = _CBA(cin, 128, 3, 1, 1)
    conv.load(p['conv'], s['conv'])
    x = conv(x)
    att = _CBA(128, 128, 1, act=False)
    att.load(p['atten'], s['atten'])
    return x * torch.sigmoid(att(F.adaptive_avg_pool2d(x, 1)))


def test_bisenetv1_resnet18_matches_torch_reference(rng):
    x = rng.standard_normal((1, 192, 192, 3)).astype(np.float32)
    mod = MODELS.build(dict(
        type='BiSeNetV1', backbone_cfg=dict(type='ResNet', depth=18),
        spatial_channels=(64, 64, 64, 128),
        context_channels=(128, 256, 512), out_indices=(0, 1, 2),
        out_channels=256))
    variables = mod.init(jax.random.PRNGKey(0), jnp.asarray(x), train=False)

    def rnd(t):
        return jnp.asarray(rng.standard_normal(t.shape).astype(np.float32)
                           * 0.05 + (1.0 if float(t.mean()) > 0.5 else 0.0))
    stats = jax.tree.map(rnd, variables['batch_stats'])
    v = {'params': variables['params'], 'batch_stats': stats}
    fuse_j, ctx8_j, ctx16_j = mod.apply(v, jnp.asarray(x), train=False)

    p, s = v['params'], v['batch_stats']
    xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
    with torch.no_grad():
        # ---- ResNet-18 context backbone ------------------------------
        bp, bs = p['ResNet_0'], s['ResNet_0']
        stem = _CBA(3, 64, 7, 2, 3)
        stem.load(bp['stem'], bs['stem'])
        h = F.max_pool2d(stem(xt), 3, 2, 1)
        feats = []
        cin = 64
        for i, (ch, stride) in enumerate(
                zip((64, 128, 256, 512), (1, 2, 2, 2))):
            for j in range(2):
                h = _basic_block(bp, bs, f'layer{i + 1}_{j}', cin, ch,
                                 stride if j == 0 else 1, h)
                cin = ch
            feats.append(h)
        x_4, x_8, x_16, x_32 = feats

        # ---- context path --------------------------------------------
        gap_conv = _CBA(512, 128, 1)
        gap_conv.load(p['gap_conv'], s['gap_conv'])
        x_gap = gap_conv(F.adaptive_avg_pool2d(x_32, 1))
        x_32_sum = _arm(p['arm32'], s['arm32'], 512, x_32) + x_gap
        x_32_up = F.interpolate(x_32_sum, size=x_16.shape[2:], mode='nearest')
        head32 = _CBA(128, 128, 3, 1, 1)
        head32.load(p['conv_head32'], s['conv_head32'])
        x_32_up = head32(x_32_up)
        x_16_sum = _arm(p['arm16'], s['arm16'], 256, x_16) + x_32_up
        x_16_up = F.interpolate(x_16_sum, size=x_8.shape[2:], mode='nearest')
        head16 = _CBA(128, 128, 3, 1, 1)
        head16.load(p['conv_head16'], s['conv_head16'])
        x_16_up = head16(x_16_up)

        # ---- spatial path: 7x7 s2, 3x3 s2, 3x3 s2, 1x1 ----------------
        sp, ss = p['spatial_path'], s['spatial_path']
        layers = [_CBA(3, 64, 7, 2, 3), _CBA(64, 64, 3, 2, 1),
                  _CBA(64, 64, 3, 2, 1), _CBA(64, 128, 1)]
        h = xt
        for i, layer in enumerate(layers):
            layer.load(sp[f'layer{i + 1}'], ss[f'layer{i + 1}'])
            h = layer(h)
        x_spatial = h

        # ---- FFM: attention conv KEEPS its ReLU ------------------------
        conv1 = _CBA(256, 256, 1)
        conv1.load(p['ffm']['conv1'], s['ffm']['conv1'])
        x_fuse = conv1(torch.cat([x_spatial, x_16_up], dim=1))
        att = _CBA(256, 256, 1, act=True)
        att.load(p['ffm']['conv_atten'], s['ffm']['conv_atten'])
        gate = torch.sigmoid(att(F.adaptive_avg_pool2d(x_fuse, 1)))
        fuse_t = x_fuse * gate + x_fuse

    for j_out, t_out in ((fuse_j, fuse_t), (ctx8_j, x_16_up),
                         (ctx16_j, x_32_up)):
        np.testing.assert_allclose(np.asarray(j_out),
                                   t_out.numpy().transpose(0, 2, 3, 1),
                                   atol=2e-3, rtol=2e-3)


def _load_bn(bn, p, s):
    with torch.no_grad():
        bn.weight.copy_(torch.from_numpy(np.asarray(p['bn']['scale']).copy()))
        bn.bias.copy_(torch.from_numpy(np.asarray(p['bn']['bias']).copy()))
        bn.running_mean.copy_(torch.from_numpy(
            np.asarray(s['bn']['mean']).copy()))
        bn.running_var.copy_(torch.from_numpy(
            np.asarray(s['bn']['var']).copy()))
    bn.eval()


def _dwsep(p, s, cin, cout, stride, x, pw_norm=True):
    """mmcv DepthwiseSeparableConvModule, dw_act=None, pw_act=None;
    pw_norm_cfg=None (BGA flavor) means the pointwise conv carries a bias
    (``bisenetv2.py:260-271,464-475``)."""
    dw = _CBA(cin, cin, 3, stride, 1, act=False, groups=cin)
    dw.load(p['dw'], s['dw'])
    h = dw(x)
    if pw_norm:
        pw = _CBA(cin, cout, 1, act=False)
        pw.load(p['pw'], s['pw'])
        return pw(h)
    conv = tnn.Conv2d(cin, cout, 1, bias=True)
    with torch.no_grad():
        conv.weight.copy_(torch.from_numpy(np.transpose(
            np.asarray(p['pw']['conv']['kernel']), (3, 2, 0, 1)).copy()))
        conv.bias.copy_(torch.from_numpy(
            np.asarray(p['pw']['conv']['bias']).copy()))
    return conv(h)


def _gelayer(p, s, cin, cout, stride, x, exp=6):
    """GELayer: 3x3 conv -> dw expansion (one dw conv at stride 1, two at
    stride 2 with no act on the first) -> 1x1 project (no act) + shortcut
    (``bisenetv2.py:179-299``)."""
    mid = cin * exp
    conv1 = _CBA(cin, cin, 3, 1, 1)
    conv1.load(p['conv1'], s['conv1'])
    h = conv1(x)
    if stride == 1:
        dw = _CBA(cin, mid, 3, 1, 1, groups=cin)
        dw.load(p['dwconv'], s['dwconv'])
        h = dw(h)
    else:
        dw1 = _CBA(cin, mid, 3, stride, 1, act=False, groups=cin)
        dw1.load(p['dwconv1'], s['dwconv1'])
        dw2 = _CBA(mid, mid, 3, 1, 1, groups=mid)
        dw2.load(p['dwconv2'], s['dwconv2'])
        h = dw2(dw1(h))
    conv2 = _CBA(mid, cout, 1, act=False)
    conv2.load(p['conv2'], s['conv2'])
    h = conv2(h)
    if stride != 1 or cin != cout:
        identity = _dwsep(p['shortcut'], s['shortcut'], cin, cout, stride, x)
    else:
        identity = x
    return F.relu(h + identity)


def test_bisenetv2_matches_torch_reference(rng):
    x = rng.standard_normal((1, 128, 128, 3)).astype(np.float32)
    mod = MODELS.build(dict(type='BiSeNetV2'))
    variables = mod.init(jax.random.PRNGKey(0), jnp.asarray(x), train=False)

    def rnd(t):
        return jnp.asarray(rng.standard_normal(t.shape).astype(np.float32)
                           * 0.05 + (1.0 if float(t.mean()) > 0.5 else 0.0))
    stats = jax.tree.map(rnd, variables['batch_stats'])
    v = {'params': variables['params'], 'batch_stats': stats}
    outs_j = mod.apply(v, jnp.asarray(x), train=False)

    p, s = v['params'], v['batch_stats']
    xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
    with torch.no_grad():
        # ---- detail branch: (s2+s1), (s2+s1+s1), (s2+s1+s1) ------------
        d = xt
        cin = 3
        for i, ch in enumerate((64, 64, 128)):
            n = 2 if i == 0 else 3
            for j in range(n):
                conv = _CBA(cin, ch, 3, 2 if j == 0 else 1, 1)
                conv.load(p[f'detail{i}_{j}'], s[f'detail{i}_{j}'])
                d = conv(d)
                cin = ch

        # ---- semantic branch -------------------------------------------
        sp, ss = p['stage1'], s['stage1']
        conv_first = _CBA(3, 16, 3, 2, 1)
        conv_first.load(sp['conv_first'], ss['conv_first'])
        h = conv_first(xt)
        c1 = _CBA(16, 8, 1)
        c1.load(sp['convs1'], ss['convs1'])
        c2 = _CBA(8, 16, 3, 2, 1)
        c2.load(sp['convs2'], ss['convs2'])
        left = c2(c1(h))
        right = F.max_pool2d(h, 3, 2, 1)
        fuse = _CBA(32, 16, 3, 1, 1)
        fuse.load(sp['fuse_last'], ss['fuse_last'])
        h = fuse(torch.cat([left, right], dim=1))
        taps_t = [h]
        chans = (16, 32, 64, 128)
        for i in range(1, 4):
            n_layers = 4 if i == 3 else 2
            h = _gelayer(p[f'stage{i + 1}_0'], s[f'stage{i + 1}_0'],
                         chans[i - 1], chans[i], 2, h)
            for j in range(1, n_layers):
                h = _gelayer(p[f'stage{i + 1}_{j}'], s[f'stage{i + 1}_{j}'],
                             chans[i], chans[i], 1, h)
            taps_t.append(h)

        # CEBlock: BN'd global pool, 1x1 conv, broadcast add, 3x3 conv.
        ce_p, ce_s = p['ce_block'], s['ce_block']
        gap_bn = tnn.BatchNorm2d(128)
        _load_bn(gap_bn, ce_p['gap_norm'], ce_s['gap_norm'])
        g = gap_bn(F.adaptive_avg_pool2d(h, 1))
        conv_gap = _CBA(128, 128, 1)
        conv_gap.load(ce_p['conv_gap'], ce_s['conv_gap'])
        g = h + conv_gap(g)
        conv_last = _CBA(128, 128, 3, 1, 1)
        conv_last.load(ce_p['conv_last'], ce_s['conv_last'])
        sem = conv_last(g)

        # ---- BGA --------------------------------------------------------
        detail_dw = _dwsep(p['detail_dwconv'], s['detail_dwconv'], 128, 128,
                           1, d, pw_norm=False)
        down = _CBA(128, 128, 3, 2, 1, act=False)
        down.load(p['detail_down'], s['detail_down'])
        detail_down = F.avg_pool2d(down(d), 3, 2, 1,
                                   count_include_pad=True)
        sem_conv = _CBA(128, 128, 3, 1, 1, act=False)
        sem_conv.load(p['semantic_conv'], s['semantic_conv'])
        sem_c = F.interpolate(sem_conv(sem), size=detail_dw.shape[2:],
                              mode='bilinear', align_corners=False)
        sem_dw = _dwsep(p['semantic_dwconv'], s['semantic_dwconv'], 128, 128,
                        1, sem, pw_norm=False)
        fuse_1 = detail_dw * torch.sigmoid(sem_c)
        fuse_2 = detail_down * torch.sigmoid(sem_dw)
        fuse_2 = F.interpolate(fuse_2, size=fuse_1.shape[2:], mode='bilinear',
                               align_corners=False)
        bga = _CBA(128, 128, 3, 1, 1)
        bga.load(p['bga_conv'], s['bga_conv'])
        head_t = bga(fuse_1 + fuse_2)

    for j_out, t_out in zip(outs_j, [head_t] + taps_t):
        np.testing.assert_allclose(np.asarray(j_out),
                                   t_out.numpy().transpose(0, 2, 3, 1),
                                   atol=2e-3, rtol=2e-3)
