"""Whole-network torch parity for MSCAN / SegNeXt (reference
``mmseg/models/backbones/mscan.py:336-466``) with transplanted weights.

Exercises in one shot: the two-conv BN+GELU stem (``mscan.py:69-112``),
OverlapPatchEmbed 3x3/s2 downsamples with a BN *before* flattening
(``mscan.py:291-333``), MSCA attention (5x5 dw + 1x7/7x1 + 1x11/11x1 +
1x21/21x1 strip pairs summed with the base map, 1x1 mix, multiplicative
gate, ``mscan.py:155-180``), the MSCASpatialAttention inner shortcut of the
*normed* input (``mscan.py:210-219``), per-block LayerScale residuals
(``mscan.py:276-289``), the conv Mlp, and the per-stage final LN at torch's
default eps=1e-5 (``mscan.py:424``).
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


def _conv(p, cin, cout, k, stride=1, padding=0, groups=1):
    if isinstance(k, int):
        k = (k, k)
    conv = tnn.Conv2d(cin, cout, k, stride, padding, groups=groups,
                      bias='bias' in p)
    with torch.no_grad():
        conv.weight.copy_(torch.from_numpy(np.transpose(
            np.asarray(p['kernel']), (3, 2, 0, 1)).copy()))
        if conv.bias is not None:
            conv.bias.copy_(torch.from_numpy(np.asarray(p['bias']).copy()))
    return conv


def _bn(p, s, dim):
    bn = tnn.BatchNorm2d(dim)
    with torch.no_grad():
        bn.weight.copy_(torch.from_numpy(np.asarray(p['bn']['scale']).copy()))
        bn.bias.copy_(torch.from_numpy(np.asarray(p['bn']['bias']).copy()))
        bn.running_mean.copy_(torch.from_numpy(
            np.asarray(s['bn']['mean']).copy()))
        bn.running_var.copy_(torch.from_numpy(
            np.asarray(s['bn']['var']).copy()))
    bn.eval()
    return bn


def _msca_attention(p, x, dim):
    h = _conv(p['conv0'], dim, dim, 5, 1, 2, groups=dim)(x)
    total = h
    for i, k in enumerate((7, 11, 21)):
        a = _conv(p[f'conv{i + 1}_1'], dim, dim, (1, k), 1, (0, k // 2),
                  groups=dim)(h)
        a = _conv(p[f'conv{i + 1}_2'], dim, dim, (k, 1), 1, (k // 2, 0),
                  groups=dim)(a)
        total = total + a
    return _conv(p['conv_mix'], dim, dim, 1)(total) * x


def _block(p, s, x, dim, mlp_ratio):
    ls1 = torch.from_numpy(np.asarray(p['layer_scale_1']).copy())
    ls2 = torch.from_numpy(np.asarray(p['layer_scale_2']).copy())
    hn = _bn(p['norm1'], s['norm1'], dim)(x)
    h = _conv(p['proj_1'], dim, dim, 1)(hn)
    h = F.gelu(h)
    h = _msca_attention(p['attn'], h, dim)
    h = _conv(p['proj_2'], dim, dim, 1)(h)
    h = h + hn
    x = x + ls1.view(1, dim, 1, 1) * h

    hidden = int(dim * mlp_ratio)
    h = _bn(p['norm2'], s['norm2'], dim)(x)
    h = _conv(p['fc1'], dim, hidden, 1)(h)
    h = _conv(p['dw'], hidden, hidden, 3, 1, 1, groups=hidden)(h)
    h = F.gelu(h)
    h = _conv(p['fc2'], hidden, dim, 1)(h)
    return x + ls2.view(1, dim, 1, 1) * h


def test_mscan_matches_torch_reference(rng):
    embed_dims = (16, 24, 32, 48)
    depths = (2, 2, 2, 2)
    mlp_ratios = (8, 8, 4, 4)
    x = rng.standard_normal((1, 64, 64, 3)).astype(np.float32)

    mod = MODELS.build(dict(type='MSCAN', embed_dims=embed_dims,
                            depths=depths, mlp_ratios=mlp_ratios))
    variables = mod.init(jax.random.PRNGKey(0), jnp.asarray(x), train=False)

    def rnd(t):
        return jnp.asarray(rng.standard_normal(t.shape).astype(np.float32)
                           * 0.05 + (1.0 if float(t.mean()) > 0.5 else 0.0))
    stats = jax.tree.map(rnd, variables['batch_stats'])
    # re-draw params too, keeping LayerScale at its small positive init
    params = jax.tree.map(rnd, variables['params'])
    v = {'params': params, 'batch_stats': stats}
    outs_j = mod.apply(v, jnp.asarray(x), train=False)

    p, s = v['params'], v['batch_stats']
    h = torch.from_numpy(x.transpose(0, 3, 1, 2))
    torch_outs = []
    with torch.no_grad():
        for i, (dim, depth) in enumerate(zip(embed_dims, depths)):
            if i == 0:
                c1 = _conv(p['stem1']['conv'], 3, dim // 2, 3, 2, 1)
                h = F.gelu(_bn(p['stem1']['norm'], s['stem1']['norm'],
                               dim // 2)(c1(h)))
                c2 = _conv(p['stem2']['conv'], dim // 2, dim, 3, 2, 1)
                h = _bn(p['stem2']['norm'], s['stem2']['norm'], dim)(c2(h))
            else:
                down = _conv(p[f'down{i}'], embed_dims[i - 1], dim, 3, 2, 1)
                h = _bn(p[f'down_norm{i}'], s[f'down_norm{i}'], dim)(down(h))
            for j in range(depth):
                h = _block(p[f's{i}_b{j}'], s[f's{i}_b{j}'], h, dim,
                           mlp_ratios[i])
            # stage-final LN over channels (NLC in the reference)
            ln = tnn.LayerNorm(dim)
            with torch.no_grad():
                ln.weight.copy_(torch.from_numpy(
                    np.asarray(p[f'stage_norm{i}']['scale']).copy()))
                ln.bias.copy_(torch.from_numpy(
                    np.asarray(p[f'stage_norm{i}']['bias']).copy()))
            h = ln(h.permute(0, 2, 3, 1)).permute(0, 3, 1, 2)
            torch_outs.append(h)

    assert len(outs_j) == 4
    for j_out, t_out in zip(outs_j, torch_outs):
        np.testing.assert_allclose(np.asarray(j_out),
                                   t_out.numpy().transpose(0, 2, 3, 1),
                                   atol=2e-3, rtol=2e-3)
