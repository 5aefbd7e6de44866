"""Swin window-attention torch parity: a hand-built torch twin of the
W-MSA + SW-MSA block pair (standard Swin semantics: pad -> cyclic shift ->
windows -> rel-pos bias + shifted mask -> unshift -> crop) with transplanted
weights must match our SwinTransformer blocks, including non-multiple
spatial sizes where the pad/shift ordering and seam mask matter."""
import numpy as np
import pytest
import torch
import torch.nn as tnn
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from lednet_tpu.models.backbones.vit import SwinTransformer
from lednet_tpu.models.getb import _relative_position_index


class TorchSwinBlock(tnn.Module):
    def __init__(self, dim, heads, ws, shift):
        super().__init__()
        self.dim, self.heads, self.ws, self.shift = dim, heads, ws, shift
        self.norm1 = tnn.LayerNorm(dim)
        self.qkv = tnn.Linear(dim, 3 * dim)
        self.table = tnn.Parameter(torch.zeros((2 * ws - 1) ** 2, heads))
        self.proj = tnn.Linear(dim, dim)
        self.norm2 = tnn.LayerNorm(dim)
        self.fc1 = tnn.Linear(dim, 4 * dim)
        self.fc2 = tnn.Linear(4 * dim, dim)
        idx = torch.from_numpy(
            np.asarray(_relative_position_index(ws)).astype(np.int64))
        self.register_buffer('rel_idx', idx.reshape(-1))

    def forward(self, x):  # x (B, H, W, C)
        B, H, W, C = x.shape
        ws, shift, heads = self.ws, self.shift, self.heads
        hd = C // heads
        h = self.norm1(x)
        pad_h, pad_w = (-H) % ws, (-W) % ws
        h = F.pad(h, (0, 0, 0, pad_w, 0, pad_h))
        Hp, Wp = H + pad_h, W + pad_w
        if shift:
            h = torch.roll(h, (-shift, -shift), dims=(1, 2))
        nh, nw = Hp // ws, Wp // ws
        wins = h.reshape(B, nh, ws, nw, ws, C).permute(0, 1, 3, 2, 4, 5)
        wins = wins.reshape(B * nh * nw, ws * ws, C)
        qkv = self.qkv(wins).reshape(-1, ws * ws, 3, heads, hd)
        q, k, v = qkv.permute(2, 0, 3, 1, 4)
        attn = (q @ k.transpose(-2, -1)) * hd ** -0.5
        bias = self.table[self.rel_idx].reshape(ws * ws, ws * ws, heads)
        attn = attn + bias.permute(2, 0, 1)[None]
        if shift:
            img_mask = torch.zeros(Hp, Wp, dtype=torch.long)
            cnt = 0
            for hs in (slice(0, -ws), slice(-ws, -shift),
                       slice(-shift, None)):
                for wsl in (slice(0, -ws), slice(-ws, -shift),
                            slice(-shift, None)):
                    img_mask[hs, wsl] = cnt
                    cnt += 1
            mw = img_mask.reshape(nh, ws, nw, ws).permute(0, 2, 1, 3)
            mw = mw.reshape(nh * nw, ws * ws)
            amask = (mw[:, None, :] != mw[:, :, None]).float() * -100.0
            attn = attn.reshape(B, nh * nw, heads, ws * ws, ws * ws)
            attn = attn + amask[None, :, None]
            attn = attn.reshape(B * nh * nw, heads, ws * ws, ws * ws)
        attn = attn.softmax(-1)
        out = (attn @ v).transpose(1, 2).reshape(-1, ws * ws, C)
        out = out.reshape(B, nh, nw, ws, ws, C).permute(0, 1, 3, 2, 4, 5)
        out = out.reshape(B, Hp, Wp, C)
        if shift:
            out = torch.roll(out, (shift, shift), dims=(1, 2))
        out = out[:, :H, :W]
        x = x + self.proj(out)
        h = self.norm2(x)
        return x + self.fc2(F.gelu(self.fc1(h)))


def _copy_block(tb: TorchSwinBlock, p, prefix):
    def t(a):
        return torch.from_numpy(np.asarray(a).copy())
    with torch.no_grad():
        tb.norm1.weight.copy_(t(p[f'{prefix}_norm1']['scale']))
        tb.norm1.bias.copy_(t(p[f'{prefix}_norm1']['bias']))
        tb.qkv.weight.copy_(t(p[f'{prefix}_qkv']['kernel']).T)
        tb.qkv.bias.copy_(t(p[f'{prefix}_qkv']['bias']))
        tb.table.copy_(t(p[f'{prefix}_rel_bias']))
        tb.proj.weight.copy_(t(p[f'{prefix}_proj']['kernel']).T)
        tb.proj.bias.copy_(t(p[f'{prefix}_proj']['bias']))
        tb.norm2.weight.copy_(t(p[f'{prefix}_norm2']['scale']))
        tb.norm2.bias.copy_(t(p[f'{prefix}_norm2']['bias']))
        tb.fc1.weight.copy_(t(p[f'{prefix}_fc1']['kernel']).T)
        tb.fc1.bias.copy_(t(p[f'{prefix}_fc1']['bias']))
        tb.fc2.weight.copy_(t(p[f'{prefix}_fc2']['kernel']).T)
        tb.fc2.bias.copy_(t(p[f'{prefix}_fc2']['bias']))


@pytest.mark.parametrize('H,W', [(14, 14), (11, 13)])  # multiple + ragged
def test_swin_stage_matches_torch(H, W, rng):
    dim, heads, ws = 16, 2, 7
    mod = SwinTransformer(embed_dims=dim, patch_size=1, window_size=ws,
                          depths=(2,), num_heads=(heads,), out_indices=(0,),
                          patch_norm=False)
    x = rng.standard_normal((1, H, W, 3)).astype(np.float32)
    variables = mod.init(jax.random.PRNGKey(0), jnp.asarray(x), train=False)
    ours = mod.apply(variables, jnp.asarray(x), train=False)[0]
    p = jax.device_get(variables['params'])

    # torch twin: patch embed (1x1 conv = linear) + W-MSA + SW-MSA + out LN
    t = torch.from_numpy(x)
    with torch.no_grad():
        emb_w = torch.from_numpy(np.asarray(
            p['patch_embed']['kernel'])[0, 0].copy())  # (3, dim)
        emb_b = torch.from_numpy(np.asarray(p['patch_embed']['bias']).copy())
        h = t @ emb_w + emb_b
        blocks = [TorchSwinBlock(dim, heads, ws, 0),
                  TorchSwinBlock(dim, heads, ws, ws // 2)]
        _copy_block(blocks[0], p, 's0_b0')
        _copy_block(blocks[1], p, 's0_b1')
        for blk in blocks:
            blk.eval()
            h = blk(h)
        ln = tnn.LayerNorm(dim)
        ln.weight.copy_(torch.from_numpy(
            np.asarray(p['out_norm0']['scale']).copy()))
        ln.bias.copy_(torch.from_numpy(
            np.asarray(p['out_norm0']['bias']).copy()))
        ref = ln(h)
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(),
                               atol=3e-4, rtol=1e-3)


def test_shifted_mask_blocks_seam_attention(rng):
    """With huge values planted at the wrapped edge, the masked SW-MSA must
    keep interior outputs unaffected — catches a missing seam mask."""
    dim, heads, ws = 8, 2, 4
    mod = SwinTransformer(embed_dims=dim, patch_size=1, window_size=ws,
                          depths=(2,), num_heads=(heads,), out_indices=(0,),
                          patch_norm=False)
    base = rng.standard_normal((1, 8, 8, 3)).astype(np.float32)
    variables = mod.init(jax.random.PRNGKey(0), jnp.asarray(base),
                         train=False)
    out_a = np.asarray(mod.apply(variables, jnp.asarray(base),
                                 train=False)[0])
    spiked = base.copy()
    spiked[0, -1, :, :] = 40.0  # bottom row wraps into top windows on shift
    out_b = np.asarray(mod.apply(variables, jnp.asarray(spiked),
                                 train=False)[0])
    # rows 0-1 wrap into the bottom window on shift; only the seam mask
    # keeps them clean of the spike (rows >= 2 legitimately change: the
    # W-MSA block propagates the spike within its bottom window first)
    np.testing.assert_allclose(out_a[0, 0:2], out_b[0, 0:2], atol=1e-3)
    # sanity: the spike genuinely propagated elsewhere
    assert np.abs(out_a[0, 4:] - out_b[0, 4:]).max() > 0.1
