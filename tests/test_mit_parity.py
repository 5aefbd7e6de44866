"""Whole-network torch parity for MiT / SegFormer (reference
``mmseg/models/backbones/mit.py:297-460``) with transplanted weights.

Exercises in one shot: overlapping patch embeds (Conv k=7/s=4/p=3 then
k=3/s=2/p=1, ``mit.py:395-401``), efficient attention with the
spatial-reduction conv on K/V (Conv k=sr, s=sr, pad 0 + LN,
``mit.py:139-146,159-166``), torch ``nn.MultiheadAttention`` math with the
combined in_proj split into q/kv, MixFFN (1x1 -> 3x3 depthwise -> exact GELU
-> 1x1, ``mit.py:54-79``), pre-LN residuals, the per-stage final LN
(``mit.py:419-421``), and the LN eps=1e-6 default (``mit.py:356``).
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


def _ln(p, dim):
    ln = tnn.LayerNorm(dim, eps=1e-6)
    with torch.no_grad():
        ln.weight.copy_(torch.from_numpy(np.asarray(p['scale']).copy()))
        ln.bias.copy_(torch.from_numpy(np.asarray(p['bias']).copy()))
    return ln


def _linear(p, cin, cout):
    fc = tnn.Linear(cin, cout)
    with torch.no_grad():
        # flax Dense kernel is (in, out); torch Linear weight is (out, in)
        fc.weight.copy_(torch.from_numpy(
            np.asarray(p['kernel']).T.copy()))
        fc.bias.copy_(torch.from_numpy(np.asarray(p['bias']).copy()))
    return fc


def _conv(p, cin, cout, k, stride=1, padding=0, groups=1):
    conv = tnn.Conv2d(cin, cout, k, stride, padding, groups=groups)
    with torch.no_grad():
        conv.weight.copy_(torch.from_numpy(np.transpose(
            np.asarray(p['kernel']), (3, 2, 0, 1)).copy()))
        conv.bias.copy_(torch.from_numpy(np.asarray(p['bias']).copy()))
    return conv


def _attention(p, x_nlc, hw, dim, num_heads, sr_ratio):
    """EfficientMultiheadAttention forward (``mit.py:157-186``) using torch
    nn.MultiheadAttention with in_proj assembled from our q/kv kernels."""
    B, N, C = x_nlc.shape
    H, W = hw
    if sr_ratio > 1:
        sr = _conv(p['sr'], dim, dim, sr_ratio, sr_ratio)
        x_kv = x_nlc.transpose(1, 2).reshape(B, C, H, W)
        x_kv = sr(x_kv).flatten(2).transpose(1, 2)
        x_kv = _ln(p['sr_norm'], dim)(x_kv)
    else:
        x_kv = x_nlc

    mha = tnn.MultiheadAttention(dim, num_heads, batch_first=True)
    q_w = np.asarray(p['q']['kernel']).T          # (C, C) out-major
    kv_w = np.asarray(p['kv']['kernel']).T        # (2C, C)
    q_b = np.asarray(p['q']['bias'])
    kv_b = np.asarray(p['kv']['bias'])
    with torch.no_grad():
        mha.in_proj_weight.copy_(torch.from_numpy(
            np.concatenate([q_w, kv_w], axis=0).copy()))
        mha.in_proj_bias.copy_(torch.from_numpy(
            np.concatenate([q_b, kv_b], axis=0).copy()))
        mha.out_proj.weight.copy_(torch.from_numpy(
            np.asarray(p['proj']['kernel']).T.copy()))
        mha.out_proj.bias.copy_(torch.from_numpy(
            np.asarray(p['proj']['bias']).copy()))
        out, _ = mha(x_nlc, x_kv, x_kv, need_weights=False)
    return out


def _mixffn(p, x_nlc, hw, dim, hidden):
    """MixFFN: 1x1 conv -> 3x3 dw conv -> exact GELU -> 1x1 conv
    (``mit.py:54-88``)."""
    B, N, C = x_nlc.shape
    H, W = hw
    h = x_nlc.transpose(1, 2).reshape(B, C, H, W)
    fc1 = tnn.Conv2d(dim, hidden, 1)
    with torch.no_grad():
        # flax Dense == 1x1 conv: kernel (in, out) -> (out, in, 1, 1)
        fc1.weight.copy_(torch.from_numpy(
            np.asarray(p['fc1']['kernel']).T.copy()).reshape(
                hidden, dim, 1, 1))
        fc1.bias.copy_(torch.from_numpy(
            np.asarray(p['fc1']['bias']).copy()))
    dw = _conv(p['dw'], hidden, hidden, 3, 1, 1, groups=hidden)
    fc2 = tnn.Conv2d(hidden, dim, 1)
    with torch.no_grad():
        fc2.weight.copy_(torch.from_numpy(
            np.asarray(p['fc2']['kernel']).T.copy()).reshape(
                dim, hidden, 1, 1))
        fc2.bias.copy_(torch.from_numpy(
            np.asarray(p['fc2']['bias']).copy()))
    h = fc2(F.gelu(dw(fc1(h))))
    return h.flatten(2).transpose(1, 2)


def test_mit_matches_torch_reference(rng):
    num_layers = (2, 2, 2, 2)
    num_heads = (1, 2, 5, 8)
    sr_ratios = (8, 4, 2, 1)
    patch_sizes = (7, 3, 3, 3)
    strides = (4, 2, 2, 2)
    embed_dims = 32
    x = rng.standard_normal((1, 64, 64, 3)).astype(np.float32)

    mod = MODELS.build(dict(
        type='MixVisionTransformer', embed_dims=embed_dims,
        num_layers=num_layers, num_heads=num_heads, sr_ratios=sr_ratios))
    variables = mod.init(jax.random.PRNGKey(0), jnp.asarray(x), train=False)
    # re-draw params at a healthy scale so activations aren't tiny
    leaves, treedef = jax.tree.flatten(variables['params'])
    leaves = [jnp.asarray(rng.standard_normal(l.shape).astype(np.float32)
                          * 0.05) for l in leaves]
    v = {'params': jax.tree.unflatten(treedef, leaves)}
    outs_j = mod.apply(v, jnp.asarray(x), train=False)

    p = v['params']
    h = torch.from_numpy(x.transpose(0, 3, 1, 2))
    cin = 3
    torch_outs = []
    with torch.no_grad():
        for i in range(4):
            dim = embed_dims * num_heads[i]
            pe = _conv(p[f'patch_embed{i}'], cin, dim, patch_sizes[i],
                       strides[i], patch_sizes[i] // 2)
            h = pe(h)
            B, C, H, W = h.shape
            t = h.flatten(2).transpose(1, 2)           # NLC
            t = _ln(p[f'embed_norm{i}'], dim)(t)
            for j in range(num_layers[i]):
                attn_in = _ln(p[f's{i}_b{j}_norm1'], dim)(t)
                t = t + _attention(p[f's{i}_b{j}_attn'], attn_in, (H, W),
                                   dim, num_heads[i], sr_ratios[i])
                ffn_in = _ln(p[f's{i}_b{j}_norm2'], dim)(t)
                t = t + _mixffn(p[f's{i}_b{j}_ffn'], ffn_in, (H, W),
                                dim, dim * 4)
            t = _ln(p[f'stage_norm{i}'], dim)(t)
            h = t.transpose(1, 2).reshape(B, C, H, W)
            torch_outs.append(h)
            cin = dim

    assert len(outs_j) == 4
    for j_out, t_out in zip(outs_j, torch_outs):
        np.testing.assert_allclose(np.asarray(j_out),
                                   t_out.numpy().transpose(0, 2, 3, 1),
                                   atol=2e-3, rtol=2e-3)
