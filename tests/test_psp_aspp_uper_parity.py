"""Torch transplant parity for the three most-used zoo decode heads.

Torch mirrors of the reference heads:
- PSPHead (``mmseg/models/decode_heads/psp_head.py``): PPM adaptive pools
  at (1,2,3,6) — non-divisible input sizes pin torch AdaptiveAvgPool2d's
  variable-window math — 1x1 convs, bilinear upsample, concat, 3x3
  bottleneck, cls_seg.
- DepthwiseSeparableASPPHead (``sep_aspp_head.py``, DeepLabV3+): separable
  ASPP branches + image pool, c1 low-level skip, two separable fusion convs.
- UPerHead (``uper_head.py``): PSP on the deepest level + FPN lateral
  top-down + per-level fpn convs + full-resolution concat bottleneck.
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

CH = 16
NCLS = 5


def _t(a):
    return torch.from_numpy(np.asarray(a).copy())


def _conv(p, x, stride=1, padding=0, dilation=1, groups=1):
    w = torch.from_numpy(np.transpose(
        np.asarray(p['kernel']), (3, 2, 0, 1)).copy())
    b = _t(p['bias']) if 'bias' in p else None
    return F.conv2d(x, w, b, stride, padding, dilation, groups)


def _bn(p, s, x):
    return F.batch_norm(x, _t(s['mean']), _t(s['var']), _t(p['scale']),
                        _t(p['bias']), False, 0.1, 1e-5)


def _cm(p, s, x, **kw):
    """ConvModule conv->BN->ReLU."""
    return F.relu(_bn(p['norm']['bn'], s['norm']['bn'], _conv(p['conv'], x, **kw)))


def _sep(p, s, x, dilation=1):
    pad = dilation
    h = _cm(p['dw'], s['dw'], x, padding=pad, dilation=dilation,
            groups=x.shape[1])
    return _cm(p['pw'], s['pw'], h)


def _up(x, size, align_corners=False):
    return F.interpolate(x, size, mode='bilinear', align_corners=align_corners)


def _cls(p, x):
    return _conv(p['conv_seg'], x)


def _rand_variables(model, xs, rng):
    variables = model.init(jax.random.PRNGKey(0), xs, train=False)

    def rnd(t):
        return jnp.asarray(rng.standard_normal(t.shape).astype(np.float32)
                           * 0.05 + (1.0 if float(t.mean()) > 0.5 else 0.0))
    stats = jax.tree.map(rnd, variables.get('batch_stats', {}))
    return {'params': variables['params'], 'batch_stats': stats}


def test_psp_head_parity(rng):
    head = MODELS.build(dict(type='PSPHead', in_channels=32, channels=CH,
                             num_classes=NCLS, dropout_ratio=0.0,
                             in_index=0, align_corners=False))
    x = rng.standard_normal((1, 10, 14, 32)).astype(np.float32)  # 10%6 != 0
    v = _rand_variables(head, [jnp.asarray(x)], rng)
    out_j = head.apply(v, [jnp.asarray(x)], train=False)

    p = jax.device_get(v['params'])
    s = jax.device_get(v['batch_stats'])
    xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
    with torch.no_grad():
        feats = [xt]
        for scale in (1, 2, 3, 6):
            pooled = F.adaptive_avg_pool2d(xt, scale)
            pooled = _cm(p[f'ppm{scale}'], s[f'ppm{scale}'], pooled)
            feats.append(_up(pooled, xt.shape[2:]))
        out = _cm(p['bottleneck'], s['bottleneck'], torch.cat(feats, 1),
                  padding=1)
        out_t = _cls(p['cls'], out)
    np.testing.assert_allclose(np.asarray(out_j),
                               out_t.numpy().transpose(0, 2, 3, 1),
                               atol=2e-4, rtol=1e-3)


def test_sep_aspp_head_parity(rng):
    head = MODELS.build(dict(
        type='DepthwiseSeparableASPPHead', in_channels=32, channels=CH,
        num_classes=NCLS, dropout_ratio=0.0, in_index=1,
        dilations=(1, 3, 6, 9), c1_in_channels=8, c1_channels=4,
        align_corners=False))
    c1 = rng.standard_normal((1, 20, 28, 8)).astype(np.float32)
    x = rng.standard_normal((1, 10, 14, 32)).astype(np.float32)
    ins = [jnp.asarray(c1), jnp.asarray(x)]
    v = _rand_variables(head, ins, rng)
    out_j = head.apply(v, ins, train=False)

    p = jax.device_get(v['params'])
    s = jax.device_get(v['batch_stats'])
    xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
    c1t = torch.from_numpy(c1.transpose(0, 3, 1, 2))
    with torch.no_grad():
        pool = _cm(p['image_pool'], s['image_pool'],
                   F.adaptive_avg_pool2d(xt, 1))
        feats = [_up(pool, xt.shape[2:])]
        for i, d in enumerate((1, 3, 6, 9)):
            if d == 1:
                feats.append(_cm(p[f'aspp{i}'], s[f'aspp{i}'], xt))
            else:
                feats.append(_sep(p[f'aspp{i}'], s[f'aspp{i}'], xt,
                                  dilation=d))
        out = _cm(p['bottleneck'], s['bottleneck'], torch.cat(feats, 1),
                  padding=1)
        c1o = _cm(p['c1_bottleneck'], s['c1_bottleneck'], c1t)
        out = torch.cat([_up(out, c1o.shape[2:]), c1o], 1)
        out = _sep(p['sep1'], s['sep1'], out)
        out = _sep(p['sep2'], s['sep2'], out)
        out_t = _cls(p['cls'], out)
    np.testing.assert_allclose(np.asarray(out_j),
                               out_t.numpy().transpose(0, 2, 3, 1),
                               atol=2e-4, rtol=1e-3)


def test_uper_head_parity(rng):
    head = MODELS.build(dict(
        type='UPerHead', in_channels=[8, 16, 24, 32], channels=CH,
        num_classes=NCLS, dropout_ratio=0.0, in_index=[0, 1, 2, 3],
        pool_scales=(1, 2, 3, 6), align_corners=False))
    shapes = [(1, 40, 56, 8), (1, 20, 28, 16), (1, 10, 14, 24), (1, 5, 7, 32)]
    xs = [rng.standard_normal(sh).astype(np.float32) for sh in shapes]
    ins = [jnp.asarray(a) for a in xs]
    v = _rand_variables(head, ins, rng)
    out_j = head.apply(v, ins, train=False)

    p = jax.device_get(v['params'])
    s = jax.device_get(v['batch_stats'])
    xts = [torch.from_numpy(a.transpose(0, 3, 1, 2)) for a in xs]
    with torch.no_grad():
        deep = xts[-1]
        psp = [deep]
        for scale in (1, 2, 3, 6):
            pooled = F.adaptive_avg_pool2d(deep, scale)
            pooled = _cm(p[f'ppm{scale}'], s[f'ppm{scale}'], pooled)
            psp.append(_up(pooled, deep.shape[2:]))
        psp_out = _cm(p['psp_bottleneck'], s['psp_bottleneck'],
                      torch.cat(psp, 1), padding=1)
        laterals = [_cm(p[f'lateral{i}'], s[f'lateral{i}'], xts[i])
                    for i in range(3)] + [psp_out]
        for i in range(3, 0, -1):
            laterals[i - 1] = laterals[i - 1] + _up(laterals[i],
                                                    laterals[i - 1].shape[2:])
        fpns = [_cm(p[f'fpn{i}'], s[f'fpn{i}'], laterals[i], padding=1)
                for i in range(3)] + [laterals[-1]]
        fpns = [_up(f, fpns[0].shape[2:]) for f in fpns]
        out = _cm(p['fpn_bottleneck'], s['fpn_bottleneck'],
                  torch.cat(fpns, 1), padding=1)
        out_t = _cls(p['cls'], out)
    np.testing.assert_allclose(np.asarray(out_j),
                               out_t.numpy().transpose(0, 2, 3, 1),
                               atol=2e-4, rtol=1e-3)
