"""PagFM + PAPPM numeric parity vs torch reimplementations of the reference
modules (``mmseg/models/backbones/pidnet.py:18-94``, ``utils/ppm.py:133-192``)
with transplanted weights — covers the PIDNet-specific fusion math beyond the
bricks already pinned by the DDRNet whole-backbone test."""
import numpy as np
import pytest
import torch
import torch.nn as tnn
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from lednet_tpu.models.backbones.pidnet import PagFM
from lednet_tpu.models.ppm import PAPPM

pytestmark = pytest.mark.slow  # whole-network transplant / long-run tier


def convbn(cin, cout, k, s=1, p=0, g=1):
    return tnn.Sequential(tnn.Conv2d(cin, cout, k, s, p, groups=g,
                                     bias=False),
                          tnn.BatchNorm2d(cout))


def _copy(dst, p, s):
    with torch.no_grad():
        dst[0].weight.copy_(torch.from_numpy(np.transpose(
            np.asarray(p['conv']['kernel']), (3, 2, 0, 1)).copy()))
        dst[1].weight.copy_(torch.from_numpy(
            np.asarray(p['norm']['bn']['scale']).copy()))
        dst[1].bias.copy_(torch.from_numpy(
            np.asarray(p['norm']['bn']['bias']).copy()))
        dst[1].running_mean.copy_(torch.from_numpy(
            np.asarray(s['norm']['bn']['mean']).copy()))
        dst[1].running_var.copy_(torch.from_numpy(
            np.asarray(s['norm']['bn']['var']).copy()))


def test_pagfm_matches_torch(rng):
    cin, ch = 16, 8
    x_p = rng.standard_normal((1, 8, 12, cin)).astype(np.float32)
    x_i = rng.standard_normal((1, 4, 6, cin)).astype(np.float32)

    mod = PagFM(cin, ch)
    variables = mod.init(jax.random.PRNGKey(0), jnp.asarray(x_p),
                         jnp.asarray(x_i), train=False)
    ours = mod.apply(variables, jnp.asarray(x_p), jnp.asarray(x_i),
                     train=False)
    p = jax.device_get(variables['params'])
    s = jax.device_get(variables['batch_stats'])

    f_i = convbn(cin, ch, 1)
    f_p = convbn(cin, ch, 1)
    _copy(f_i, p['f_i'], s['f_i'])
    _copy(f_p, p['f_p'], s['f_p'])
    f_i.eval(), f_p.eval()
    tp = torch.from_numpy(x_p.transpose(0, 3, 1, 2))
    ti = torch.from_numpy(x_i.transpose(0, 3, 1, 2))
    with torch.no_grad():
        fi = F.interpolate(f_i(ti), size=tp.shape[2:], mode='bilinear',
                           align_corners=False)
        fp = f_p(tp)
        sigma = torch.sigmoid((fp * fi).sum(1, keepdim=True))
        up_i = F.interpolate(ti, size=tp.shape[2:], mode='bilinear',
                             align_corners=False)
        ref = sigma * up_i + (1 - sigma) * tp
    ref = ref.numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(np.asarray(ours), ref, atol=2e-5, rtol=1e-4)


def test_pappm_matches_torch(rng):
    cin, branch, cout = 32, 8, 16
    x = rng.standard_normal((1, 16, 24, cin)).astype(np.float32)
    mod = PAPPM(cin, branch, cout, num_scales=5)
    variables = mod.init(jax.random.PRNGKey(0), jnp.asarray(x), train=False)
    ours = mod.apply(variables, jnp.asarray(x), train=False)
    p = jax.device_get(variables['params'])
    s = jax.device_get(variables['batch_stats'])

    def pre(cin_, cout_, k, g=1):  # BN -> ReLU -> conv (pre-act)
        return tnn.Sequential(tnn.BatchNorm2d(cin_), tnn.ReLU(),
                              tnn.Conv2d(cin_, cout_, k, padding=k // 2,
                                         groups=g, bias=False))

    def copy_pre(dst, pp, ss):
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

    scale0 = pre(cin, branch, 1)
    copy_pre(scale0, p['scale0'], s['scale0'])
    scales = []
    pools = [tnn.AvgPool2d(5, 2, 2), tnn.AvgPool2d(9, 4, 4),
             tnn.AvgPool2d(17, 8, 8)]
    for i in range(1, 5):
        m = pre(cin, branch, 1)
        copy_pre(m, p[f'scale{i}'], s[f'scale{i}'])
        scales.append(m)
    processes = pre(branch * 4, branch * 4, 3, g=4)
    copy_pre(processes, p['processes'], s['processes'])
    compression = pre(branch * 5, cout, 1)
    copy_pre(compression, p['compression'], s['compression'])
    shortcut = pre(cin, cout, 1)
    copy_pre(shortcut, p['shortcut'], s['shortcut'])
    for m in [scale0, processes, compression, shortcut] + scales:
        m.eval()

    t = torch.from_numpy(x.transpose(0, 3, 1, 2))
    with torch.no_grad():
        x0 = scale0(t)
        feats = []
        for i in range(1, 5):
            pooled = pools[i - 1](t) if i < 4 else \
                F.adaptive_avg_pool2d(t, 1)
            up = F.interpolate(scales[i - 1](pooled), t.shape[2:],
                               mode='bilinear', align_corners=False)
            feats.append(up + x0)
        scale_out = processes(torch.cat(feats, 1))
        ref = compression(torch.cat([x0, scale_out], 1)) + shortcut(t)
    ref = ref.numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(np.asarray(ours), ref, atol=5e-5, rtol=1e-3)
