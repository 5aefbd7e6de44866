"""Torch parity for STDCContextPathNet (whole network, transplanted
weights) and UNet (default InterpConv decoder + DeconvModule/stride
variants), reference ``mmseg/models/backbones/stdc.py`` / ``unet.py``.

Covers the sweep fixes: STDCContextPathNet's ``conv_avg`` and the two
ARM-following convs keep mmcv ConvModule's default ReLU
(``stdc.py:384-396``); UNet's BasicConvBlock first conv is never dilated
and carries the stage stride (``unet.py:61-74``); UNet honors
``upsample_cfg`` (InterpConv vs DeconvModule).
"""
import pytest
import numpy as np
import torch
import torch.nn as tnn
import torch.nn.functional as F

import jax
import jax.numpy as jnp

import lednet_tpu
from lednet_tpu.models.backbones.unet import (BasicConvBlock, DeconvModule,
                                              UNet)
from lednet_tpu.registry import MODELS

pytestmark = pytest.mark.slow  # whole-network transplant / long-run tier

lednet_tpu.register_all_modules()


def _load_cb(conv, bn, p, s):
    with torch.no_grad():
        conv.weight.copy_(torch.from_numpy(np.transpose(
            np.asarray(p['conv']['kernel']), (3, 2, 0, 1)).copy()))
        if conv.bias is not None:
            conv.bias.copy_(torch.from_numpy(
                np.asarray(p['conv']['bias']).copy()))
        if bn is not None:
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
    def __init__(self, cin, cout, k, stride=1, padding=0, groups=1,
                 dilation=1, act=True, norm=True, bias=None):
        super().__init__()
        if bias is None:
            bias = not norm
        self.conv = tnn.Conv2d(cin, cout, k, stride, padding, dilation,
                               groups, bias=bias)
        self.bn = tnn.BatchNorm2d(cout) if norm else None
        self.act = act

    def load(self, p, s=None):
        _load_cb(self.conv, self.bn, p, s)
        return self

    def forward(self, x):
        x = self.conv(x)
        if self.bn is not None:
            x = self.bn(x)
        return F.relu(x) if self.act else x


def _rand_stats(variables, rng):
    def rnd(t):
        return jnp.asarray(rng.standard_normal(t.shape).astype(np.float32)
                           * 0.05 + (1.0 if float(t.mean()) > 0.5 else 0.0))
    return {'params': variables['params'],
            'batch_stats': jax.tree.map(rnd, variables['batch_stats'])}


def _torch_stdc_module_cat(p, s, cin, cout, stride, x):
    conv0 = _CBA(cin, cout // 2, 1).load(p['conv0'], s['conv0'])
    x0 = conv0(x)
    h = x0
    taps = [x0]
    for i, (ci, co) in enumerate(((cout // 2, cout // 4),
                                  (cout // 4, cout // 8),
                                  (cout // 8, cout // 8))):
        if i == 0 and stride == 2:
            down = _CBA(cout // 2, cout // 2, 3, 2, 1, groups=cout // 2,
                        act=False).load(p['downsample'], s['downsample'])
            h = down(h)
        conv = _CBA(ci, co, 3, 1, 1).load(p[f'conv{i + 1}'], s[f'conv{i + 1}'])
        h = conv(h)
        taps.append(h)
    if stride == 2:
        taps[0] = F.avg_pool2d(x0, 3, 2, 1, count_include_pad=True)
    return torch.cat(taps, dim=1)


def _torch_arm(p, s, cin, cout, x):
    conv = _CBA(cin, cout, 3, 1, 1).load(p['conv'], s['conv'])
    atten = _CBA(cout, cout, 1, act=False).load(p['atten'], s['atten'])
    h = conv(x)
    return h * torch.sigmoid(atten(F.adaptive_avg_pool2d(h, 1)))


def test_stdc_context_path_matches_torch(rng):
    x = rng.standard_normal((1, 64, 64, 3)).astype(np.float32)
    cfg = dict(type='STDCContextPathNet',
               backbone_cfg=dict(type='STDCNet', stdc_type='STDCNet1',
                                 in_channels=3,
                                 channels=(32, 64, 256, 512, 1024),
                                 bottleneck_type='cat', num_convs=4,
                                 norm_cfg=dict(type='BN'),
                                 act_cfg=dict(type='ReLU'),
                                 with_final_conv=False),
               last_in_channels=(1024, 512), out_channels=128,
               ffm_cfg=dict(in_channels=384, out_channels=256,
                            scale_factor=4))
    mod = MODELS.build(cfg)
    variables = mod.init(jax.random.PRNGKey(0), jnp.asarray(x), train=False)
    v = _rand_stats(variables, rng)
    outs_j = mod.apply(v, jnp.asarray(x), train=False)

    p, s = v['params'], v['batch_stats']
    bp, bs = p['STDCNet_0'], s['STDCNet_0']
    xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
    with torch.no_grad():
        h = _CBA(3, 32, 3, 2, 1).load(bp['stage0'], bs['stage0'])(xt)
        h = _CBA(32, 64, 3, 2, 1).load(bp['stage1'], bs['stage1'])(h)
        outs_t = []
        cin = 64
        for st, cout in ((2, 256), (3, 512), (4, 1024)):
            for j, stride in enumerate((2, 1)):
                h = _torch_stdc_module_cat(bp[f'stage{st}_{j}'],
                                           bs[f'stage{st}_{j}'],
                                           cin if j == 0 else cout, cout,
                                           stride, h)
                cin = cout
            outs_t.append(h)

        avg = F.adaptive_avg_pool2d(outs_t[-1], 1)
        conv_avg = _CBA(1024, 128, 1).load(p['conv_avg'], s['conv_avg'])
        feature_up = F.interpolate(conv_avg(avg), size=outs_t[-1].shape[2:],
                                   mode='nearest')
        arms_out = []
        for i, cin_arm in enumerate((1024, 512)):
            x_arm = _torch_arm(p[f'arm{i}'], s[f'arm{i}'], cin_arm, 128,
                               outs_t[2 - i]) + feature_up
            feature_up = F.interpolate(x_arm, size=outs_t[1 - i].shape[2:],
                                       mode='nearest')
            conv = _CBA(128, 128, 3, 1, 1).load(p[f'conv{i}'], s[f'conv{i}'])
            feature_up = conv(feature_up)
            arms_out.append(feature_up)

        ffm_conv0 = _CBA(384, 256, 1).load(p['ffm']['conv0'], s['ffm']['conv0'])
        fused = ffm_conv0(torch.cat([outs_t[0], arms_out[1]], dim=1))
        a1 = _CBA(256, 64, 1, norm=False, bias=False).load(p['ffm']['attn1'])
        a2 = _CBA(64, 256, 1, act=False, norm=False,
                  bias=False).load(p['ffm']['attn2'])
        attn = torch.sigmoid(a2(a1(F.adaptive_avg_pool2d(fused, 1))))
        feat_fuse = fused * attn + fused

        expected = [outs_t[0]] + arms_out + [feat_fuse]

    assert len(outs_j) == 4
    for j_out, t_out in zip(outs_j, expected):
        np.testing.assert_allclose(np.asarray(j_out),
                                   t_out.numpy().transpose(0, 2, 3, 1),
                                   atol=2e-3, rtol=2e-3)


def _torch_basic_conv_block(p, s, cin, cout, num_convs, stride, dilation, x):
    for i in range(num_convs):
        first = i == 0
        conv = _CBA(cin if first else cout, cout, 3,
                    stride if first else 1,
                    1 if first else dilation,
                    dilation=1 if first else dilation)
        conv.load(p[f'conv{i}'], s[f'conv{i}'])
        x = conv(x)
    return x


def test_unet_default_matches_torch(rng):
    x = rng.standard_normal((1, 32, 32, 3)).astype(np.float32)
    mod = UNet(in_channels=3, base_channels=8, num_stages=3,
               strides=(1, 1, 1), enc_num_convs=(2, 2, 2),
               dec_num_convs=(2, 2), downsamples=(True, True),
               enc_dilations=(1, 1, 1), dec_dilations=(1, 2))
    variables = mod.init(jax.random.PRNGKey(0), jnp.asarray(x), train=False)
    v = _rand_stats(variables, rng)
    outs_j = mod.apply(v, jnp.asarray(x), train=False)

    p, s = v['params'], v['batch_stats']
    xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
    with torch.no_grad():
        enc = []
        h = xt
        cin = 3
        for i, ch in enumerate((8, 16, 32)):
            if i > 0:
                h = F.max_pool2d(h, 2)
            h = _torch_basic_conv_block(p[f'enc{i}'], s[f'enc{i}'], cin, ch,
                                        2, 1, 1, h)
            enc.append(h)
            cin = ch
        dec_t = [h]
        for i, dil in ((1, 2), (0, 1)):
            ch = 8 * 2 ** i
            # InterpConv: bilinear x2 (align_corners=False) then 1x1 conv.
            up = F.interpolate(h, scale_factor=2, mode='bilinear',
                               align_corners=False)
            conv = _CBA(2 * ch, ch, 1).load(p[f'up{i}']['conv'],
                                            s[f'up{i}']['conv'])
            up = conv(up)
            h = _torch_basic_conv_block(p[f'dec{i}'], s[f'dec{i}'], 2 * ch,
                                        ch, 2, 1, dil,
                                        torch.cat([enc[i], up], dim=1))
            dec_t.append(h)

    for j_out, t_out in zip(outs_j, dec_t):
        np.testing.assert_allclose(np.asarray(j_out),
                                   t_out.numpy().transpose(0, 2, 3, 1),
                                   atol=1e-3, rtol=1e-3)


def test_unet_deconv_module_matches_torch(rng):
    x = rng.standard_normal((1, 6, 5, 12)).astype(np.float32)
    mod = DeconvModule(12, 7)
    variables = mod.init(jax.random.PRNGKey(0), jnp.asarray(x), train=False)
    v = _rand_stats(variables, rng)
    out_j = mod.apply(v, jnp.asarray(x), train=False)

    p, s = v['params'], v['batch_stats']
    deconv = tnn.ConvTranspose2d(12, 7, 4, 2, 1)
    with torch.no_grad():
        # flax ConvTranspose(transpose_kernel=True) stores (kh, kw, out, in)
        # with torch's spatial orientation.
        deconv.weight.copy_(torch.from_numpy(np.transpose(
            np.asarray(p['deconv']['kernel']), (3, 2, 0, 1)).copy()))
        deconv.bias.copy_(torch.from_numpy(
            np.asarray(p['deconv']['bias']).copy()))
    bn = tnn.BatchNorm2d(7)
    with torch.no_grad():
        bn.weight.copy_(torch.from_numpy(np.asarray(
            p['norm']['bn']['scale']).copy()))
        bn.bias.copy_(torch.from_numpy(np.asarray(
            p['norm']['bn']['bias']).copy()))
        bn.running_mean.copy_(torch.from_numpy(np.asarray(
            s['norm']['bn']['mean']).copy()))
        bn.running_var.copy_(torch.from_numpy(np.asarray(
            s['norm']['bn']['var']).copy()))
    bn.eval()
    xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
    with torch.no_grad():
        out_t = F.relu(bn(deconv(xt)))
    assert out_t.shape[-2:] == (12, 10)
    np.testing.assert_allclose(np.asarray(out_j),
                               out_t.numpy().transpose(0, 2, 3, 1),
                               atol=1e-4, rtol=1e-4)


def test_unet_stride_conv_downsampling(rng):
    """strides[i]=2 uses a stride conv in the first stage conv, no maxpool."""
    x = rng.standard_normal((1, 16, 16, 3)).astype(np.float32)
    mod = UNet(in_channels=3, base_channels=4, num_stages=3,
               strides=(1, 2, 2), enc_num_convs=(2, 2, 2),
               dec_num_convs=(2, 2), downsamples=(False, False),
               enc_dilations=(1, 1, 1), dec_dilations=(1, 1),
               upsample_cfg=dict(type='DeconvModule'))
    variables = mod.init(jax.random.PRNGKey(0), jnp.asarray(x), train=False)
    outs = mod.apply({'params': variables['params'],
                      'batch_stats': variables['batch_stats']},
                     jnp.asarray(x), train=False)
    assert [tuple(o.shape) for o in outs] == [
        (1, 4, 4, 16), (1, 8, 8, 8), (1, 16, 16, 4)]
    # stride-2 stages must have no pooling: enc1 conv0 consumes 16x16.
    assert 'deconv' in variables['params']['up1']


def test_unet_first_conv_not_dilated(rng):
    """BasicConvBlock: conv0 dilation 1, later convs dilated (unet.py:61-74)."""
    x = rng.standard_normal((1, 10, 10, 5)).astype(np.float32)
    mod = BasicConvBlock(5, 6, num_convs=3, dilation=3)
    variables = mod.init(jax.random.PRNGKey(0), jnp.asarray(x), train=False)
    v = _rand_stats(variables, rng)
    out_j = mod.apply(v, jnp.asarray(x), train=False)

    p, s = v['params'], v['batch_stats']
    xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
    with torch.no_grad():
        out_t = _torch_basic_conv_block(p, s, 5, 6, 3, 1, 3, xt)
    np.testing.assert_allclose(np.asarray(out_j),
                               out_t.numpy().transpose(0, 2, 3, 1),
                               atol=1e-4, rtol=1e-4)
