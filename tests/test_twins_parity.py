"""Whole-network torch transplant parity for Twins PCPVT / SVT.

Functional torch mirror of reference ``mmseg/models/backbones/twins.py``:
corner-padded non-overlapping patch embeds + LN, GSA blocks (the SegFormer
EfficientMultiheadAttention via torch ``nn.MultiheadAttention`` with an
sr-conv on K/V), plain mmcv FFN (Linear-GELU-Linear), conditional position
encoding (3x3 depthwise conv residual) after block 0 of each stage, LSA
windowed attention with the reference's pad mask (effective only when both
pads are nonzero — the ``-0:`` fill quirk), per-stage final LN.

Odd input (36x44) exercises the corner padding and the LSA mask.
"""
import numpy as np
import torch
import torch.nn as tnn
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from lednet_tpu.registry import MODELS
import lednet_tpu.models  # noqa: F401

DIMS = (32, 64)
HEADS = (2, 4)
DEPTHS = (2, 2)
SRS = (2, 1)
PATCH = (4, 2)
MLP = (4, 4)
WS = (4, 4)


def _t(a):
    return torch.from_numpy(np.asarray(a).copy())


def _ln(p, x):
    return F.layer_norm(x, x.shape[-1:], _t(p['scale']), _t(p['bias']),
                        eps=1e-5)


def _linear(p, x):
    b = _t(p['bias']) if 'bias' in p else None
    return F.linear(x, _t(p['kernel']).T.contiguous(), b)


def _conv(p, x, stride=1, padding=0, groups=1):
    w = torch.from_numpy(np.transpose(
        np.asarray(p['kernel']), (3, 2, 0, 1)).copy())
    return F.conv2d(x, w, _t(p['bias']), stride, padding, groups=groups)


def _gsa(p, x_nlc, hw, dim, heads, sr):
    """EfficientMultiheadAttention with identity=0 (twins.py:143-145)."""
    B, N, C = x_nlc.shape
    H, W = hw
    if sr > 1:
        kv = x_nlc.transpose(1, 2).reshape(B, C, H, W)
        kv = _conv(p['sr'], kv, stride=sr)
        kv = kv.flatten(2).transpose(1, 2)
        kv = _ln(p['sr_norm'], kv)
    else:
        kv = x_nlc
    mha = tnn.MultiheadAttention(dim, heads, batch_first=True)
    with torch.no_grad():
        mha.in_proj_weight.copy_(torch.cat(
            [_t(p['q']['kernel']).T, _t(p['kv']['kernel']).T], dim=0))
        mha.in_proj_bias.copy_(torch.cat(
            [_t(p['q']['bias']), _t(p['kv']['bias'])]))
        mha.out_proj.weight.copy_(_t(p['proj']['kernel']).T)
        mha.out_proj.bias.copy_(_t(p['proj']['bias']))
        out, _ = mha(x_nlc, kv, kv, need_weights=False)
    return out


def _lsa(p, x_nlc, hw, dim, heads, ws):
    """LocallyGroupedSelfAttention (twins.py:192-244), reference math."""
    b, n, c = x_nlc.shape
    h, w = hw
    x = x_nlc.view(b, h, w, c)
    pad_r = (ws - w % ws) % ws
    pad_b = (ws - h % ws) % ws
    x = F.pad(x, (0, 0, 0, pad_r, 0, pad_b))
    Hp, Wp = x.shape[1:-1]
    _h, _w = Hp // ws, Wp // ws
    mask = torch.zeros((1, Hp, Wp))
    mask[:, -pad_b:, :].fill_(1)
    mask[:, :, -pad_r:].fill_(1)
    x = x.reshape(b, _h, ws, _w, ws, c).transpose(2, 3)
    mask = mask.reshape(1, _h, ws, _w, ws).transpose(2, 3).reshape(
        1, _h * _w, ws * ws)
    attn_mask = mask.unsqueeze(2) - mask.unsqueeze(3)
    attn_mask = attn_mask.masked_fill(attn_mask != 0, float(-1000.0))
    qkv = _linear(p['qkv'], x).reshape(
        b, _h * _w, ws * ws, 3, heads, c // heads).permute(3, 0, 1, 4, 2, 5)
    q, k, v = qkv[0], qkv[1], qkv[2]
    attn = (q @ k.transpose(-2, -1)) * (c // heads) ** -0.5
    attn = attn + attn_mask.unsqueeze(2)
    attn = attn.softmax(dim=-1)
    out = (attn @ v).transpose(2, 3).reshape(b, _h, _w, ws, ws, c)
    out = out.transpose(2, 3).reshape(b, _h * ws, _w * ws, c)
    out = out[:, :h, :w, :].reshape(b, n, c)
    return _linear(p['proj'], out)


def _ffn(p, x):
    return _linear(p['fc2'], F.gelu(_linear(p['fc1'], x)))


def _twins_forward(p, x_nchw, svt=False):
    outs = []
    b = x_nchw.shape[0]
    x = x_nchw
    for s, (dim, depth) in enumerate(zip(DIMS, DEPTHS)):
        ps = PATCH[s]
        ph = (-x.shape[2]) % ps
        pw = (-x.shape[3]) % ps
        x = F.pad(x, (0, pw, 0, ph))  # mmcv 'corner' padding
        x = _conv(p[f'patch_embed{s}'], x, stride=ps)
        h_, w_ = x.shape[2:]
        x = x.flatten(2).transpose(1, 2)
        x = _ln(p[f'embed_norm{s}'], x)
        for blk in range(depth):
            pre = f's{s}_b{blk}'
            hnorm = _ln(p[f'{pre}_norm1'], x)
            if svt and blk % 2 == 0:
                attn = _lsa({'qkv': p[f'{pre}_qkv'],
                             'proj': p[f'{pre}_proj']},
                            hnorm, (h_, w_), dim, HEADS[s], WS[s])
            else:
                attn = _gsa(p[f'{pre}_attn'], hnorm, (h_, w_), dim,
                            HEADS[s], SRS[s])
            x = x + attn
            x = x + _ffn(p[f'{pre}_ffn'], _ln(p[f'{pre}_norm2'], x))
            if blk == 0:
                cnn = x.transpose(1, 2).view(b, dim, h_, w_)
                cnn = _conv(p[f'cpe{s}']['proj'], cnn, padding=1,
                            groups=dim) + cnn
                x = cnn.flatten(2).transpose(1, 2)
        x = _ln(p[f'stage_norm{s}'], x)
        x = x.reshape(b, h_, w_, dim).permute(0, 3, 1, 2).contiguous()
        outs.append(x)
    return outs


def _run(rng, model_cfg, svt):
    model = MODELS.build(model_cfg)
    x = rng.standard_normal((1, 36, 44, 3)).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x), train=False)
    outs_j = model.apply(variables, jnp.asarray(x), train=False)
    p = jax.device_get(variables['params'])
    with torch.no_grad():
        outs_t = _twins_forward(p, torch.from_numpy(x.transpose(0, 3, 1, 2)),
                                svt=svt)
    assert len(outs_j) == len(outs_t) == 2
    for i, (a, bt) in enumerate(zip(outs_j, outs_t)):
        np.testing.assert_allclose(
            np.asarray(a), bt.numpy().transpose(0, 2, 3, 1),
            atol=5e-4, rtol=1e-3, err_msg=f'stage{i}')


def test_pcpvt_full_parity(rng):
    _run(rng, dict(type='PCPVT', embed_dims=DIMS, num_heads=HEADS,
                   patch_sizes=PATCH, strides=PATCH, mlp_ratios=MLP,
                   depths=DEPTHS, sr_ratios=SRS, out_indices=(0, 1),
                   qkv_bias=True, norm_after_stage=True,
                   drop_path_rate=0.0), svt=False)


def test_svt_full_parity(rng):
    _run(rng, dict(type='SVT', embed_dims=DIMS, num_heads=HEADS,
                   patch_sizes=PATCH, strides=PATCH, mlp_ratios=MLP,
                   depths=DEPTHS, sr_ratios=SRS, out_indices=(0, 1),
                   qkv_bias=True, norm_after_stage=True,
                   windiow_sizes=WS, drop_path_rate=0.0), svt=True)
