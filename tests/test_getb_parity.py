"""GETB (GlobalLocalAttention) numeric parity vs a torch reimplementation of
the reference module (``UNetFormer_GETB.py:97-206``), weights transplanted.
This pins the windowed-attention reconstruction bit-for-bit."""
import numpy as np
import pytest
import torch
import torch.nn as tnn
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from lednet_tpu.models.getb import GlobalLocalAttention, _relative_position_index


class TorchGLA(tnn.Module):
    """Faithful torch version of the reference's GlobalLocalAttention."""

    def __init__(self, dim, num_heads, ws=8):
        super().__init__()
        self.num_heads = num_heads
        self.ws = ws
        self.scale = (dim // num_heads) ** -0.5
        self.qkv = tnn.Conv2d(dim, 3 * dim, 1, bias=False)
        self.proj_dw = tnn.Conv2d(dim, dim, ws, padding=(ws - 1) // 2,
                                  groups=dim, bias=False)
        self.proj_bn = tnn.BatchNorm2d(dim)
        self.proj_pw = tnn.Conv2d(dim, dim, 1, bias=False)
        self.attn_x = tnn.AvgPool2d(kernel_size=(ws, 1), stride=1,
                                    padding=(ws // 2 - 1, 0))
        self.attn_y = tnn.AvgPool2d(kernel_size=(1, ws), stride=1,
                                    padding=(0, ws // 2 - 1))
        self.rel_bias = tnn.Parameter(torch.zeros((2 * ws - 1) ** 2,
                                                  num_heads))
        idx = _relative_position_index(ws)
        self.register_buffer('rel_idx', torch.from_numpy(idx.astype(np.int64)))

    def forward(self, x):
        B, C, H, W = x.shape
        ws = self.ws
        local = x
        pad_w = (ws - W % ws) % ws
        pad_h = (ws - H % ws) % ws
        xp = F.pad(x, (0, pad_w, 0, pad_h), mode='reflect')
        Hp, Wp = H + pad_h, W + pad_w
        qkv = self.qkv(xp)
        hh, ww = Hp // ws, Wp // ws
        hd = C // self.num_heads
        qkv = qkv.reshape(B, 3, self.num_heads, hd, hh, ws, ww, ws)
        qkv = qkv.permute(1, 0, 4, 6, 2, 5, 7, 3).reshape(
            3, B * hh * ww, self.num_heads, ws * ws, hd)
        q, k, v = qkv[0], qkv[1], qkv[2]
        dots = (q @ k.transpose(-2, -1)) * self.scale
        bias = self.rel_bias[self.rel_idx.view(-1)].view(
            ws * ws, ws * ws, -1).permute(2, 0, 1)
        dots = dots + bias.unsqueeze(0)
        attn = dots.softmax(-1) @ v
        attn = attn.reshape(B, hh, ww, self.num_heads, ws, ws, hd)
        attn = attn.permute(0, 3, 6, 1, 4, 2, 5).reshape(B, C, Hp, Wp)
        attn = attn[:, :, :H, :W]
        out = self.attn_x(F.pad(attn, (0, 0, 0, 1), mode='reflect')) + \
            self.attn_y(F.pad(attn, (0, 1, 0, 0), mode='reflect'))
        out = out + local
        out = F.pad(out, (0, 1, 0, 1), mode='reflect')
        out = self.proj_pw(self.proj_bn(self.proj_dw(out)))
        return out[:, :, :H, :W]


def test_gla_matches_torch(rng):
    dim, heads, ws = 16, 2, 4
    H, W = 10, 14  # non-multiple of ws: exercises the reflect-pad path
    x = rng.standard_normal((1, H, W, dim)).astype(np.float32)

    mod = GlobalLocalAttention(dim, heads, window_size=ws)
    variables = mod.init(jax.random.PRNGKey(0), jnp.asarray(x), train=False)
    params = jax.device_get(variables['params'])
    # randomize the bias table so the test is non-trivial
    table = rng.standard_normal(params['relative_position_bias_table'].shape
                                ).astype(np.float32) * 0.2
    params['relative_position_bias_table'] = table
    ours = mod.apply({'params': params,
                      'batch_stats': variables.get('batch_stats', {})},
                     jnp.asarray(x), train=False)

    ref = TorchGLA(dim, heads, ws)
    with torch.no_grad():
        ref.qkv.weight.copy_(torch.from_numpy(np.transpose(
            np.asarray(params['qkv']['kernel']), (3, 2, 0, 1)).copy()))
        # flax depthwise kernel (k,k,1,C) -> torch (C,1,k,k)
        dw = np.asarray(params['proj_dw']['kernel'])
        ref.proj_dw.weight.copy_(torch.from_numpy(
            np.transpose(dw, (3, 2, 0, 1)).copy()))
        pw = np.asarray(params['proj_pw']['kernel'])
        ref.proj_pw.weight.copy_(torch.from_numpy(
            np.transpose(pw, (3, 2, 0, 1)).copy()))
        bn = params['proj_norm']['bn']
        ref.proj_bn.weight.copy_(torch.from_numpy(np.asarray(bn['scale'])))
        ref.proj_bn.bias.copy_(torch.from_numpy(np.asarray(bn['bias'])))
        ref.rel_bias.copy_(torch.from_numpy(table))
    ref.eval()
    out_ref = ref(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    out_ref = out_ref.detach().numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(np.asarray(ours), out_ref, atol=5e-5,
                               rtol=1e-4)
