"""JPU + FPNHead numeric parity vs torch reimplementations of the reference
modules (``mmseg/models/necks/jpu.py:11-131``,
``mmseg/models/decode_heads/fpn_head.py:10-67``) with transplanted weights —
pins this session's new neck/head math to the torch semantics."""
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


def convbn(cin, cout, k, s=1, p=0, g=1, d=1):
    return tnn.Sequential(tnn.Conv2d(cin, cout, k, s, p, dilation=d,
                                     groups=g, bias=False),
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


def test_jpu_matches_torch(rng):
    chans, mid = (8, 16, 32), 8
    feats = [rng.standard_normal((1, 16 // (2 ** i), 16 // (2 ** i), c))
             .astype(np.float32) for i, c in enumerate(chans)]

    neck = MODELS.build(dict(type='JPU', in_channels=chans, mid_channels=mid))
    variables = neck.init(jax.random.PRNGKey(0),
                          [jnp.asarray(f) for f in feats], train=False)
    ours = neck.apply(variables, [jnp.asarray(f) for f in feats],
                      train=False)
    p = jax.device_get(variables['params'])
    s = jax.device_get(variables['batch_stats'])

    convs = []
    for i, c in enumerate(chans):
        m = convbn(c, mid, 3, p=1)
        _copy(m, p[f'conv{i}'], s[f'conv{i}'])
        m.eval()
        convs.append(m)
    cat_ch = mid * len(chans)
    dils = []
    for j, d in enumerate((1, 2, 4, 8)):
        dw = convbn(cat_ch, cat_ch, 3, p=d, g=cat_ch, d=d)
        pw = convbn(cat_ch, mid, 1)
        _copy(dw, p[f'dil{j}_dw'], s[f'dil{j}_dw'])
        _copy(pw, p[f'dil{j}_pw'], s[f'dil{j}_pw'])
        dw.eval(), pw.eval()
        dils.append((dw, pw))

    ts = [torch.from_numpy(f.transpose(0, 3, 1, 2)) for f in feats]
    with torch.no_grad():
        fs = [F.relu(convs[i](ts[i])) for i in range(3)]
        size = fs[0].shape[2:]
        fs = [fs[0]] + [F.interpolate(f, size=size, mode='bilinear',
                                      align_corners=False) for f in fs[1:]]
        feat = torch.cat(fs, dim=1)
        branches = [F.relu(pw(dw(feat))) for dw, pw in dils]
        concat = torch.cat(branches, dim=1)
    ref = concat.numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(np.asarray(ours[-1]), ref, atol=2e-5,
                               rtol=1e-4)


def test_fpn_head_matches_torch(rng):
    chans = (8, 8, 8, 8)
    ch, ncls = 8, 5
    feats = [rng.standard_normal((1, 16 // (2 ** i), 16 // (2 ** i), 8))
             .astype(np.float32) for i in range(4)]

    head = MODELS.build(dict(type='FPNHead', in_channels=chans, channels=ch,
                             num_classes=ncls, feature_strides=(4, 8, 16, 32),
                             dropout_ratio=0.0))
    variables = head.init(jax.random.PRNGKey(0),
                          [jnp.asarray(f) for f in feats], train=False)
    ours = head.apply(variables, [jnp.asarray(f) for f in feats],
                      train=False)
    p = jax.device_get(variables['params'])
    s = jax.device_get(variables['batch_stats'])

    ts = [torch.from_numpy(f.transpose(0, 3, 1, 2)) for f in feats]
    with torch.no_grad():
        output = None
        for i, stride in enumerate((4, 8, 16, 32)):
            head_length = max(1, i)
            t = ts[i]
            for k in range(head_length):
                m = convbn(t.shape[1], ch, 3, p=1)
                _copy(m, p[f'scale{i}_conv{k}'], s[f'scale{i}_conv{k}'])
                m.eval()
                t = F.relu(m(t))
                if stride != 4:
                    t = F.interpolate(t, scale_factor=2, mode='bilinear',
                                      align_corners=False)
            if output is None:
                output = t
            else:
                output = output + F.interpolate(
                    t, size=output.shape[2:], mode='bilinear',
                    align_corners=False)
        cls = tnn.Conv2d(ch, ncls, 1)
        cls.weight.copy_(torch.from_numpy(np.transpose(
            np.asarray(p['cls']['conv_seg']['kernel']), (3, 2, 0, 1)).copy()))
        cls.bias.copy_(torch.from_numpy(
            np.asarray(p['cls']['conv_seg']['bias']).copy()))
        ref = cls(output)
    ref = ref.numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(np.asarray(ours), ref, atol=2e-5, rtol=1e-4)


def test_vpd_depth_decoder_deconv_matches_torch(rng):
    """flax ConvTranspose == torch ConvTranspose2d with the kernel spatially
    flipped — pins the deconv convention the mmseg2jax converter relies on
    for VPDDepthDecoder / Feature2Pyramid weights."""
    import flax.linen as nn

    x = rng.standard_normal((1, 4, 4, 3)).astype(np.float32)
    mod = nn.ConvTranspose(5, (2, 2), strides=(2, 2), use_bias=False)
    v = mod.init(jax.random.PRNGKey(0), jnp.asarray(x))
    ours = np.asarray(mod.apply(v, jnp.asarray(x)))
    k = np.asarray(v['params']['kernel'])  # (kh, kw, cin, cout)

    t = tnn.ConvTranspose2d(3, 5, 2, 2, bias=False)
    with torch.no_grad():
        t.weight.copy_(torch.from_numpy(
            k[::-1, ::-1].transpose(2, 3, 0, 1).copy()))
        ref = t(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    np.testing.assert_allclose(ours, ref.numpy().transpose(0, 2, 3, 1),
                               atol=2e-5, rtol=1e-4)

    # and the converter's tensor rule inverts that exactly
    import os.path as osp
    import sys
    sys.path.insert(0, osp.join(osp.dirname(osp.abspath(__file__)), '..',
                                'tools', 'model_converters'))
    from mmseg2jax import convert_tensor
    back = convert_tensor('decoder.deconv_layers.0.weight',
                          t.weight.detach().numpy())
    np.testing.assert_allclose(back, k, atol=1e-7)
