"""Whole-network torch transplant parity for SCTNet.

Torch mirror of reference ``mmseg/models/backbones/sctnet.py:11-471``:
stem to 1/4, BasicBlock stages (plain Conv2d, bias=True), CFBlocks
(ConvolutionalAttention strip-kernel banks with per-head spatial softmax +
channel normalization; BN(eps=1e-6)->3x3->GELU->3x3 MLP) at 1/16 and 1/32,
and the in-repo DAPPM_head clone (bias=True convs, unlike DDRNet's).
Both outputs (concat@1/8, stage2@1/8) must match after jax->torch transplant.
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

pytestmark = pytest.mark.slow  # whole-network transplant / long-run tier

C = 16  # base channels (small for test speed); attention inter stays 64


class TBasic(tnn.Module):
    def __init__(self, cin, cout, stride=1, down=False, no_relu=False):
        super().__init__()
        self.conv1 = tnn.Conv2d(cin, cout, 3, stride, 1)
        self.bn1 = tnn.BatchNorm2d(cout)
        self.conv2 = tnn.Conv2d(cout, cout, 3, 1, 1)
        self.bn2 = tnn.BatchNorm2d(cout)
        self.down = tnn.Sequential(
            tnn.Conv2d(cin, cout, 1, stride), tnn.BatchNorm2d(cout)) \
            if down else None
        self.no_relu = no_relu

    def forward(self, x):
        out = self.bn2(self.conv2(F.relu(self.bn1(self.conv1(x)))))
        residual = self.down(x) if self.down is not None else x
        out = out + residual
        return out if self.no_relu else F.relu(out)


class TConvAttn(tnn.Module):
    def __init__(self, cin, inter=64, heads=8):
        super().__init__()
        self.inter, self.heads = inter, heads
        self.norm = tnn.BatchNorm2d(cin)
        self.kv = tnn.Parameter(torch.zeros(inter, cin, 7, 1))
        self.kv3 = tnn.Parameter(torch.zeros(inter, cin, 1, 7))

    def _act_dn(self, x):
        n, _, h, w = x.shape
        x = x.reshape([n, self.heads, self.inter // self.heads, -1])
        x = F.softmax(x, dim=3)
        x = x / (torch.sum(x, dim=2, keepdim=True) + 1e-06)
        return x.reshape([n, self.inter, h, w])

    def forward(self, x):
        x = self.norm(x)
        x1 = F.conv2d(x, self.kv, padding=(3, 0))
        x1 = F.conv2d(self._act_dn(x1), self.kv.transpose(1, 0),
                      padding=(3, 0))
        x3 = F.conv2d(x, self.kv3, padding=(0, 3))
        x3 = F.conv2d(self._act_dn(x3), self.kv3.transpose(1, 0),
                      padding=(0, 3))
        return x1 + x3


class TCFBlock(tnn.Module):
    def __init__(self, ch, heads=8):
        super().__init__()
        self.attn = TConvAttn(ch, heads=heads)
        self.mlp_norm = tnn.BatchNorm2d(ch, eps=1e-06)
        self.mlp_conv1 = tnn.Conv2d(ch, ch, 3, 1, 1)
        self.mlp_conv2 = tnn.Conv2d(ch, ch, 3, 1, 1)

    def forward(self, x):
        x = x + self.attn(x)
        h = self.mlp_conv2(F.gelu(self.mlp_conv1(self.mlp_norm(x))))
        return x + h


def pre(cin, cout, k):
    return tnn.Sequential(tnn.BatchNorm2d(cin), tnn.ReLU(),
                          tnn.Conv2d(cin, cout, k, padding=k // 2))


class TDAPPMHead(tnn.Module):
    """Reference DAPPM_head: plain Conv2d (bias=True) everywhere."""

    def __init__(self, cin, branch, cout):
        super().__init__()
        self.scale0 = pre(cin, branch, 1)
        self.pools = tnn.ModuleList([
            tnn.AvgPool2d(5, 2, 2), tnn.AvgPool2d(9, 4, 4),
            tnn.AvgPool2d(17, 8, 8)])
        self.scale_convs = tnn.ModuleList([pre(cin, branch, 1)
                                           for _ in range(4)])
        self.processes = tnn.ModuleList([pre(branch, branch, 3)
                                         for _ in range(4)])
        self.compression = pre(branch * 5, cout, 1)
        self.shortcut = pre(cin, cout, 1)

    def forward(self, x):
        size = x.shape[2:]
        feats = [self.scale0(x)]
        for i in range(1, 5):
            pooled = self.pools[i - 1](x) if i < 4 \
                else F.adaptive_avg_pool2d(x, 1)
            up = F.interpolate(self.scale_convs[i - 1](pooled), size,
                               mode='bilinear', align_corners=False)
            feats.append(self.processes[i - 1](up + feats[i - 1]))
        return self.compression(torch.cat(feats, 1)) + self.shortcut(x)


class TSCTNet(tnn.Module):
    def __init__(self, c=C, spp=4 * C, heads=8):
        super().__init__()
        self.conv1 = tnn.Sequential(
            tnn.Conv2d(3, c, 3, 2, 1), tnn.BatchNorm2d(c), tnn.ReLU(),
            tnn.Conv2d(c, c, 3, 2, 1), tnn.BatchNorm2d(c), tnn.ReLU())
        self.layer1 = tnn.Sequential(TBasic(c, c), TBasic(c, c, no_relu=True))
        self.layer2 = tnn.Sequential(TBasic(c, 2 * c, 2, down=True),
                                     TBasic(2 * c, 2 * c, no_relu=True))
        self.layer3 = tnn.Sequential(TBasic(2 * c, 4 * c, 2, down=True),
                                     TBasic(4 * c, 4 * c, no_relu=True))
        self.layer3_2 = TCFBlock(4 * c, heads)
        self.convdown4 = tnn.Sequential(
            tnn.Conv2d(4 * c, 8 * c, 3, 2, 1), tnn.BatchNorm2d(8 * c),
            tnn.ReLU())
        self.layer4 = TCFBlock(8 * c, heads)
        self.layer5 = TCFBlock(8 * c, heads)
        self.spp = TDAPPMHead(8 * c, spp, 2 * c)

    def forward(self, x):
        x1 = self.layer1(self.conv1(x))
        x2 = self.layer2(F.relu(x1))
        x3 = self.layer3_2(F.relu(self.layer3(F.relu(x2))))
        x4 = self.layer4(F.relu(self.convdown4(x3)))
        x5 = self.layer5(F.relu(x4))
        x7 = F.interpolate(self.spp(x5), size=x2.shape[2:], mode='bilinear')
        return torch.cat([x2, x7], dim=1), x2


def _copy_conv(dst, p):
    with torch.no_grad():
        dst.weight.copy_(torch.from_numpy(np.transpose(
            np.asarray(p['kernel']), (3, 2, 0, 1)).copy()))
        if 'bias' in p:
            dst.bias.copy_(torch.from_numpy(np.asarray(p['bias']).copy()))


def _copy_bn(dst, p_bn, s_bn):
    with torch.no_grad():
        dst.weight.copy_(torch.from_numpy(np.asarray(p_bn['scale']).copy()))
        dst.bias.copy_(torch.from_numpy(np.asarray(p_bn['bias']).copy()))
        dst.running_mean.copy_(torch.from_numpy(
            np.asarray(s_bn['mean']).copy()))
        dst.running_var.copy_(torch.from_numpy(np.asarray(s_bn['var']).copy()))


def _copy_cm(dst_conv, dst_bn, p, s):
    """flax ConvModule dict -> torch (conv, bn) pair."""
    _copy_conv(dst_conv, p['conv'])
    _copy_bn(dst_bn, p['norm']['bn'], s['norm']['bn'])


def _copy_basic(t, p, s):
    _copy_cm(t.conv1, t.bn1, p['conv1'], s['conv1'])
    _copy_cm(t.conv2, t.bn2, p['conv2'], s['conv2'])
    if t.down is not None:
        _copy_cm(t.down[0], t.down[1], p['down'], s['down'])


def _copy_cf(t, p, s):
    _copy_bn(t.attn.norm, p['attn']['norm']['bn'], s['attn']['norm']['bn'])
    with torch.no_grad():
        t.attn.kv.copy_(torch.from_numpy(np.transpose(
            np.asarray(p['attn']['kv']), (3, 2, 0, 1)).copy()))
        t.attn.kv3.copy_(torch.from_numpy(np.transpose(
            np.asarray(p['attn']['kv3']), (3, 2, 0, 1)).copy()))
    _copy_bn(t.mlp_norm, p['mlp_norm']['bn'], s['mlp_norm']['bn'])
    _copy_conv(t.mlp_conv1, p['mlp_conv1'])
    _copy_conv(t.mlp_conv2, p['mlp_conv2'])


def test_sctnet_full_parity(rng):
    model = MODELS.build(dict(type='SCTNet', base_channels=C,
                              spp_channels=4 * C, drop_path_rate=0.0))
    x = rng.standard_normal((1, 64, 96, 3)).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x), train=False)

    def rnd(t):
        return jnp.asarray(rng.standard_normal(t.shape).astype(np.float32)
                           * 0.05 + (1.0 if t.mean() > 0.5 else 0.0))
    stats = jax.tree.map(rnd, variables['batch_stats'])
    # kv/kv3 init to ~0 -> give them real values so attention is non-trivial
    params = jax.device_get(variables['params'])
    for blk in ('layer3_2', 'layer4', 'layer5'):
        for k in ('kv', 'kv3'):
            params[blk]['attn'][k] = jnp.asarray(
                rng.standard_normal(params[blk]['attn'][k].shape)
                .astype(np.float32) * 0.05)
    variables = {'params': params, 'batch_stats': stats}
    out_j, x2_j = model.apply(variables, jnp.asarray(x), train=False)

    p = jax.device_get(variables['params'])
    s = jax.device_get(variables['batch_stats'])
    t = TSCTNet()
    _copy_cm(t.conv1[0], t.conv1[1], p['stem1'], s['stem1'])
    _copy_cm(t.conv1[3], t.conv1[4], p['stem2'], s['stem2'])
    for li, tl in (('layer1', t.layer1), ('layer2', t.layer2),
                   ('layer3', t.layer3)):
        for i in range(2):
            _copy_basic(tl[i], p[f'{li}_{i}'], s[f'{li}_{i}'])
    for name, blk in (('layer3_2', t.layer3_2), ('layer4', t.layer4),
                      ('layer5', t.layer5)):
        _copy_cf(blk, p[name], s[name])
    _copy_cm(t.convdown4[0], t.convdown4[1], p['convdown4'], s['convdown4'])
    sp, ss = p['spp'], s['spp']
    _copy_cm(t.spp.scale0[2], t.spp.scale0[0], sp['scale0'], ss['scale0'])
    for i in range(4):
        _copy_cm(t.spp.scale_convs[i][2], t.spp.scale_convs[i][0],
                 sp[f'scale{i + 1}'], ss[f'scale{i + 1}'])
        _copy_cm(t.spp.processes[i][2], t.spp.processes[i][0],
                 sp[f'process{i}'], ss[f'process{i}'])
    _copy_cm(t.spp.compression[2], t.spp.compression[0], sp['compression'],
             ss['compression'])
    _copy_cm(t.spp.shortcut[2], t.spp.shortcut[0], sp['shortcut'],
             ss['shortcut'])

    t.eval()
    with torch.no_grad():
        out_t, x2_t = t(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    np.testing.assert_allclose(np.asarray(x2_j),
                               x2_t.numpy().transpose(0, 2, 3, 1),
                               atol=2e-4, rtol=1e-3, err_msg='x2')
    np.testing.assert_allclose(np.asarray(out_j),
                               out_t.numpy().transpose(0, 2, 3, 1),
                               atol=5e-4, rtol=1e-3, err_msg='x_out')
