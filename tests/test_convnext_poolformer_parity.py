"""Whole-network torch transplant parity for ConvNeXt and PoolFormer.

The reference consumes both from mmpretrain in its config corpus
(``configs/_base_/models/upernet_convnext.py``, ``fpn_poolformer_s12.py``);
torch mirrors here follow the published architectures with mmpretrain's
dense-prediction output path (per-out-index LayerNorm for ConvNeXt,
interleaved out_indices for PoolFormer).
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

DEPTHS = (2, 2)
CHANNELS = (16, 32)


def _t(a):
    return torch.from_numpy(np.asarray(a).copy())


def _ln_cl(p, x):
    """LayerNorm over the channel dim of a channels-last tensor."""
    return F.layer_norm(x, x.shape[-1:], _t(p['scale']), _t(p['bias']),
                        eps=1e-6)


def _conv(p, x, stride=1, padding=0, groups=1):
    w = torch.from_numpy(np.transpose(
        np.asarray(p['kernel']), (3, 2, 0, 1)).copy())
    return F.conv2d(x, w, _t(p['bias']), stride, padding, groups=groups)


def _convnext_forward(p, x):
    outs = []
    for s, (depth, dim) in enumerate(zip(DEPTHS, CHANNELS)):
        if s == 0:
            x = _conv(p['stem_conv'], x, stride=4)
            x = _ln_cl(p['stem_norm'],
                       x.permute(0, 2, 3, 1)).permute(0, 3, 1, 2)
        else:
            x = _ln_cl(p[f'down{s}_norm'],
                       x.permute(0, 2, 3, 1)).permute(0, 3, 1, 2)
            x = _conv(p[f'down{s}_conv'], x, stride=2)
        for b in range(depth):
            bp = p[f's{s}_b{b}']
            h = _conv(bp['dwconv'], x, padding=3, groups=dim)
            h = h.permute(0, 2, 3, 1)
            h = _ln_cl(bp['norm'], h)
            h = F.linear(h, _t(bp['pwconv1']['kernel']).T.contiguous(),
                         _t(bp['pwconv1']['bias']))
            h = F.gelu(h)
            h = F.linear(h, _t(bp['pwconv2']['kernel']).T.contiguous(),
                         _t(bp['pwconv2']['bias']))
            h = h * _t(bp['ls']['gamma'])
            x = x + h.permute(0, 3, 1, 2)
        outs.append(_ln_cl(p[f'out_norm{s}'],
                           x.permute(0, 2, 3, 1)).permute(0, 3, 1, 2))
    return outs


def test_convnext_full_parity(rng):
    model = MODELS.build(dict(
        type='ConvNeXt', arch=dict(depths=DEPTHS, channels=CHANNELS),
        out_indices=(0, 1), drop_path_rate=0.0,
        layer_scale_init_value=1e-6))
    x = rng.standard_normal((1, 32, 48, 3)).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x), train=False)

    def rnd(t):
        return jnp.asarray(rng.standard_normal(t.shape).astype(np.float32)
                           * 0.05 + float(t.mean() > 0.5))
    params = jax.tree.map(rnd, variables['params'])
    outs_j = model.apply({'params': params}, jnp.asarray(x), train=False)

    with torch.no_grad():
        outs_t = _convnext_forward(jax.device_get(params),
                                   torch.from_numpy(x.transpose(0, 3, 1, 2)))
    assert len(outs_j) == len(outs_t) == 2
    for i, (a, b) in enumerate(zip(outs_j, outs_t)):
        np.testing.assert_allclose(
            np.asarray(a), b.numpy().transpose(0, 2, 3, 1),
            atol=2e-4, rtol=1e-3, err_msg=f'stage{i}')


def _gn1(p, x):
    return F.group_norm(x, 1, _t(p['scale']), _t(p['bias']), eps=1e-5)


def _poolformer_forward(p, x):
    outs = []
    pool = tnn.AvgPool2d(3, stride=1, padding=1, count_include_pad=False)
    for s, (depth, dim) in enumerate(zip((2, 2), (16, 32))):
        if s == 0:
            x = _conv(p['patch_embed0'], x, stride=4, padding=2)
        else:
            x = _conv(p[f'patch_embed{s}'], x, stride=2, padding=1)
        for b in range(depth):
            bp = p[f's{s}_b{b}']
            h = _gn1(bp['norm1'], x)
            h = pool(h) - h
            x = x + h * _t(bp['ls1']['gamma']).view(1, dim, 1, 1)
            h = _gn1(bp['norm2'], x)
            h = _conv(bp['fc1'], h)
            h = F.gelu(h)
            h = _conv(bp['fc2'], h)
            x = x + h * _t(bp['ls2']['gamma']).view(1, dim, 1, 1)
        outs.append(x)
    return outs


def test_poolformer_full_parity(rng):
    model = MODELS.build(dict(
        type='PoolFormer', arch=dict(layers=(2, 2), embed_dims=(16, 32)),
        out_indices=(0, 2), layer_scale_init_value=1e-5))
    x = rng.standard_normal((1, 33, 49, 3)).astype(np.float32)  # odd sizes
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x), train=False)

    def rnd(t):
        return jnp.asarray(rng.standard_normal(t.shape).astype(np.float32)
                           * 0.05 + float(t.mean() > 0.5))
    params = jax.tree.map(rnd, variables['params'])
    outs_j = model.apply({'params': params}, jnp.asarray(x), train=False)

    with torch.no_grad():
        outs_t = _poolformer_forward(jax.device_get(params),
                                     torch.from_numpy(x.transpose(0, 3, 1, 2)))
    assert len(outs_j) == len(outs_t) == 2
    for i, (a, b) in enumerate(zip(outs_j, outs_t)):
        np.testing.assert_allclose(
            np.asarray(a), b.numpy().transpose(0, 2, 3, 1),
            atol=2e-4, rtol=1e-3, err_msg=f'stage{i}')
