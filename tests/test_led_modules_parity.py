"""Muti_AFF and SEAM numeric parity vs torch reimplementations of the
reference prototypes (``tools/speed/model_utils_speed.py:316-389``,
``tools/speed/ddrnet_speed.py:88-93,282-338``), weights transplanted —
completes brick-level pinning of every LED-Net-specific module."""
import numpy as np
import pytest
import torch
import torch.nn as tnn
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from lednet_tpu.models.aff import MutiAFF
from lednet_tpu.models.seam import SEAM


class TorchMutiAFF(tnn.Module):
    def __init__(self, channels, r=4):
        super().__init__()
        inter = channels // r

        def bottleneck():
            return tnn.Sequential(
                tnn.Conv2d(channels, inter, 1), tnn.ReLU(),
                tnn.Conv2d(inter, channels, 1))
        self.local_att = bottleneck()
        self.context1 = bottleneck()
        self.context2 = bottleneck()
        self.context3 = bottleneck()
        self.global_att = bottleneck()

    def forward(self, x, residual):
        h, w = x.shape[2:]
        xa = x + residual
        xl = self.local_att(xa)
        c1 = F.interpolate(self.context1(F.adaptive_avg_pool2d(xa, 4)),
                           size=(h, w), mode='nearest')
        c2 = F.interpolate(self.context2(F.adaptive_avg_pool2d(xa, 8)),
                           size=(h, w), mode='nearest')
        c3 = F.interpolate(self.context3(F.adaptive_avg_pool2d(xa, 16)),
                           size=(h, w), mode='nearest')
        xg = self.global_att(F.adaptive_avg_pool2d(xa, 1))
        wei = torch.sigmoid(xl + xg + c1 + c2 + c3)
        return 2 * x * wei + 2 * residual * (1 - wei)


def _copy_bottleneck(dst, p):
    with torch.no_grad():
        for conv_t, name in [(dst[0], 'conv1'), (dst[2], 'conv2')]:
            conv_t.weight.copy_(torch.from_numpy(np.transpose(
                np.asarray(p[name]['kernel']), (3, 2, 0, 1)).copy()))
            conv_t.bias.copy_(torch.from_numpy(
                np.asarray(p[name]['bias']).copy()))


def test_muti_aff_matches_torch(rng):
    C = 16
    x = rng.standard_normal((1, 24, 32, C)).astype(np.float32)
    res = rng.standard_normal((1, 24, 32, C)).astype(np.float32)
    mod = MutiAFF(C)
    variables = mod.init(jax.random.PRNGKey(0), jnp.asarray(x),
                         jnp.asarray(res), train=False)
    ours = mod.apply(variables, jnp.asarray(x), jnp.asarray(res), train=False)
    p = jax.device_get(variables['params'])

    t = TorchMutiAFF(C)
    _copy_bottleneck(t.local_att, p['local_att'])
    _copy_bottleneck(t.context1, p['context4'])
    _copy_bottleneck(t.context2, p['context8'])
    _copy_bottleneck(t.context3, p['context16'])
    _copy_bottleneck(t.global_att, p['global_att'])
    t.eval()
    with torch.no_grad():
        ref = t(torch.from_numpy(x.transpose(0, 3, 1, 2)),
                torch.from_numpy(res.transpose(0, 3, 1, 2)))
    ref = ref.numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(np.asarray(ours), ref, atol=2e-5, rtol=1e-4)


def test_seam_matches_torch(rng):
    C = 8
    x = rng.standard_normal((1, 16, 24, C)).astype(np.float32)
    mod = SEAM(C)
    variables = mod.init(jax.random.PRNGKey(0), jnp.asarray(x), train=False)
    ours = mod.apply(variables, jnp.asarray(x), train=False)
    p = jax.device_get(variables['params'])
    s = jax.device_get(variables['batch_stats'])

    conv1 = tnn.Sequential(tnn.Conv2d(C, 1, 3, padding=1, bias=False),
                           tnn.BatchNorm2d(1))
    conv2 = tnn.Sequential(tnn.Conv2d(1, C, 3, padding=1, bias=False),
                           tnn.BatchNorm2d(C))
    for dst, name in [(conv1, 'conv_1'), (conv2, 'conv_2')]:
        with torch.no_grad():
            dst[0].weight.copy_(torch.from_numpy(np.transpose(
                np.asarray(p[name]['conv']['kernel']), (3, 2, 0, 1)).copy()))
            dst[1].weight.copy_(torch.from_numpy(
                np.asarray(p[name]['norm']['bn']['scale']).copy()))
            dst[1].bias.copy_(torch.from_numpy(
                np.asarray(p[name]['norm']['bn']['bias']).copy()))
            dst[1].running_mean.copy_(torch.from_numpy(
                np.asarray(s[name]['norm']['bn']['mean']).copy()))
            dst[1].running_var.copy_(torch.from_numpy(
                np.asarray(s[name]['norm']['bn']['var']).copy()))
    conv1.eval(), conv2.eval()

    lap = torch.tensor([-1., -1, -1, -1, 8, -1, -1, -1, -1]).reshape(1, 1, 3, 3)
    with torch.no_grad():
        t = torch.from_numpy(x.transpose(0, 3, 1, 2))
        seg = conv1(t)
        seg = (seg - seg.min()) / (seg.max() - seg.min() + 1e-12)
        b1 = F.conv2d(seg, lap, padding=1).clamp(min=0)
        b1 = (b1 > 0.1).float()
        b2 = F.conv2d(seg, lap, stride=2, padding=1).clamp(min=0)
        b4 = F.conv2d(seg, lap, stride=4, padding=1).clamp(min=0)
        b2 = (F.interpolate(b2, b1.shape[2:], mode='nearest') > 0.1).float()
        b4 = (F.interpolate(b4, b1.shape[2:], mode='nearest') > 0.1).float()
        fused = ((0.6 * b1 + 0.3 * b2 + 0.1 * b4) > 0.1).float()
        ref = conv2(fused)
    ref = ref.numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(np.asarray(ours), ref, atol=2e-5, rtol=1e-4)
