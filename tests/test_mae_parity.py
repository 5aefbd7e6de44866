"""Whole-network torch transplant parity for MAE (BEiT-family ViT).

Torch mirror of reference ``mmseg/models/backbones/mae.py:46-260`` +
``beit.py:47-225``: patch embed, cls token, absolute position embedding
added after the cls concat (MAE-only, mae.py:243-245), BEiT attention
(bias-free packed qkv with separate q/v bias and zero k bias, relative
position bias table with 3 cls entries), gamma_1/2 layer scaling, final
norm on the last layer, cls stripped from outputs.
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

DIM, HEADS, LAYERS, P = 32, 4, 4, 8
IMG = (32, 48)  # grid 4x6 == rel-pos window (no table resize path)


def _rel_pos_index(wh, ww):
    """Reference BEiT relative_position_index (beit.py:86-113)."""
    num_rel = (2 * wh - 1) * (2 * ww - 1) + 3
    coords = torch.stack(
        torch.meshgrid(torch.arange(wh), torch.arange(ww), indexing='ij'))
    flat = torch.flatten(coords, 1)
    rel = flat[:, :, None] - flat[:, None, :]
    rel = rel.permute(1, 2, 0).contiguous()
    rel[:, :, 0] += wh - 1
    rel[:, :, 1] += ww - 1
    rel[:, :, 0] *= 2 * ww - 1
    index = torch.zeros((wh * ww + 1,) * 2, dtype=rel.dtype)
    index[1:, 1:] = rel.sum(-1)
    index[0, 0:] = num_rel - 3
    index[0:, 0] = num_rel - 2
    index[0, 0] = num_rel - 1
    return index


def _t(a):
    return torch.from_numpy(np.asarray(a).copy())


class TMAEBlock(tnn.Module):
    def __init__(self, dim, heads, grid):
        super().__init__()
        self.heads = heads
        self.norm1 = tnn.LayerNorm(dim, eps=1e-6)
        self.qkv = tnn.Linear(dim, 3 * dim, bias=False)
        self.q_bias = tnn.Parameter(torch.zeros(dim))
        self.v_bias = tnn.Parameter(torch.zeros(dim))
        num_rel = (2 * grid[0] - 1) * (2 * grid[1] - 1) + 3
        self.table = tnn.Parameter(torch.zeros(num_rel, heads))
        self.register_buffer('index', _rel_pos_index(*grid))
        self.proj = tnn.Linear(dim, dim)
        self.norm2 = tnn.LayerNorm(dim, eps=1e-6)
        self.fc1 = tnn.Linear(dim, 4 * dim)
        self.fc2 = tnn.Linear(4 * dim, dim)
        self.gamma1 = tnn.Parameter(torch.zeros(dim))
        self.gamma2 = tnn.Parameter(torch.zeros(dim))

    def forward(self, x):
        B, N, C = x.shape
        hd = C // self.heads
        h = self.norm1(x)
        bias = torch.cat([self.q_bias, torch.zeros_like(self.q_bias),
                          self.v_bias])
        qkv = F.linear(h, self.qkv.weight, bias)
        qkv = qkv.reshape(B, N, 3, self.heads, hd).permute(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        attn = (q @ k.transpose(-2, -1)) * hd ** -0.5
        rel = self.table[self.index.view(-1)].view(N, N, -1)
        attn = attn + rel.permute(2, 0, 1).unsqueeze(0)
        attn = attn.softmax(dim=-1)
        h = self.proj((attn @ v).transpose(1, 2).reshape(B, N, C))
        x = x + self.gamma1 * h
        h = self.fc2(F.gelu(self.fc1(self.norm2(x))))
        return x + self.gamma2 * h


class TMAE(tnn.Module):
    def __init__(self, grid):
        super().__init__()
        self.patch = tnn.Conv2d(3, DIM, P, stride=P)
        self.cls_token = tnn.Parameter(torch.zeros(1, 1, DIM))
        self.pos_embed = tnn.Parameter(
            torch.zeros(1, grid[0] * grid[1] + 1, DIM))
        self.blocks = tnn.ModuleList(
            [TMAEBlock(DIM, HEADS, grid) for _ in range(LAYERS)])
        self.norm1 = tnn.LayerNorm(DIM, eps=1e-6)
        self.grid = grid

    def forward(self, x):
        B = x.shape[0]
        x = self.patch(x).flatten(2).transpose(1, 2)
        x = torch.cat([self.cls_token.expand(B, -1, -1), x], dim=1)
        x = x + self.pos_embed
        outs = []
        for i, blk in enumerate(self.blocks):
            x = blk(x)
            if i == LAYERS - 1:
                x = self.norm1(x)
            if i in (1, LAYERS - 1):
                out = x[:, 1:].reshape(B, *self.grid, DIM)
                outs.append(out.permute(0, 3, 1, 2).contiguous())
        return outs


def test_mae_full_parity(rng):
    model = MODELS.build(dict(
        type='MAE', img_size=IMG, patch_size=P, embed_dims=DIM,
        num_layers=LAYERS, num_heads=HEADS, mlp_ratio=4,
        out_indices=(1, LAYERS - 1), final_norm=True, drop_path_rate=0.0,
        init_values=0.1))
    x = rng.standard_normal((1, IMG[0], IMG[1], 3)).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x), train=False)

    def rnd(t):
        return jnp.asarray(rng.standard_normal(t.shape).astype(np.float32)
                           * 0.05 + (1.0 if float(t.mean()) > 0.05 else 0.0))
    params = jax.tree.map(rnd, variables['params'])
    variables = {'params': params}
    outs_j = model.apply(variables, jnp.asarray(x), train=False)

    p = jax.device_get(params)
    grid = (IMG[0] // P, IMG[1] // P)
    t = TMAE(grid)
    with torch.no_grad():
        t.patch.weight.copy_(torch.from_numpy(np.transpose(
            np.asarray(p['patch_embed']['kernel']), (3, 2, 0, 1)).copy()))
        t.patch.bias.copy_(_t(p['patch_embed']['bias']))
        t.cls_token.copy_(_t(p['cls_token']))
        t.pos_embed.copy_(_t(p['pos_embed']))
        t.norm1.weight.copy_(_t(p['final_norm']['scale']))
        t.norm1.bias.copy_(_t(p['final_norm']['bias']))
        for i, blk in enumerate(t.blocks):
            blk.norm1.weight.copy_(_t(p[f'b{i}_norm1']['scale']))
            blk.norm1.bias.copy_(_t(p[f'b{i}_norm1']['bias']))
            blk.norm2.weight.copy_(_t(p[f'b{i}_norm2']['scale']))
            blk.norm2.bias.copy_(_t(p[f'b{i}_norm2']['bias']))
            a = p[f'b{i}_attn']
            blk.qkv.weight.copy_(_t(a['qkv']['kernel']).T)
            blk.q_bias.copy_(_t(a['q_bias']))
            blk.v_bias.copy_(_t(a['v_bias']))
            blk.table.copy_(_t(a['relative_position_bias_table']))
            blk.proj.weight.copy_(_t(a['proj']['kernel']).T)
            blk.proj.bias.copy_(_t(a['proj']['bias']))
            blk.fc1.weight.copy_(_t(p[f'b{i}_fc1']['kernel']).T)
            blk.fc1.bias.copy_(_t(p[f'b{i}_fc1']['bias']))
            blk.fc2.weight.copy_(_t(p[f'b{i}_fc2']['kernel']).T)
            blk.fc2.bias.copy_(_t(p[f'b{i}_fc2']['bias']))
            blk.gamma1.copy_(_t(p[f'b{i}_gamma1']))
            blk.gamma2.copy_(_t(p[f'b{i}_gamma2']))

    t.eval()
    with torch.no_grad():
        outs_t = t(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    assert len(outs_j) == len(outs_t) == 2
    for i, (a, b) in enumerate(zip(outs_j, outs_t)):
        np.testing.assert_allclose(
            np.asarray(a), b.numpy().transpose(0, 2, 3, 1),
            atol=5e-4, rtol=1e-3, err_msg=f'out{i}')
