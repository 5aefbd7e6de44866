"""Twins backbones (PCPVT / SVT).

Behavioral spec: reference ``mmseg/models/backbones/twins.py`` — PCPVT =
PVT-style stages (patch embed + spatial-reduction attention) with conditional
position encoding (a 3x3 depthwise conv after the first block of each
stage); SVT alternates locally-grouped window attention with global
sub-sampled attention. Both reuse the MiT building blocks here.
"""
from __future__ import annotations

from typing import Dict, Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp

from lednet_tpu.models.backbones.mit import EfficientAttention
from lednet_tpu.models.layers import (DropPath, kaiming_init,
                                      drop_path_rates as _dpr)
from lednet_tpu.registry import MODELS


class _CPE(nn.Module):
    """Conditional position encoding: 3x3 depthwise conv residual."""
    dim: int

    @nn.compact
    def __call__(self, x):
        return x + nn.Conv(self.dim, (3, 3), padding=((1, 1), (1, 1)),
                           feature_group_count=self.dim,
                           kernel_init=kaiming_init, name='proj')(x)


class _FFN(nn.Module):
    """Plain mmcv FFN (Linear-GELU-Linear, ``add_identity=False``) — the
    reference's Twins layers use this (``twins.py:129-136,296-303``), NOT
    SegFormer's MixFFN; residual is added by the caller."""
    dim: int
    hidden_dim: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Dense(self.hidden_dim, name='fc1')(x)
        x = nn.gelu(x, approximate=False)
        return nn.Dense(self.dim, name='fc2')(x)


@MODELS.register_module()
class PCPVT(nn.Module):
    in_channels: int = 3
    embed_dims: Sequence[int] = (64, 128, 320, 512)
    num_heads: Sequence[int] = (1, 2, 5, 8)
    patch_sizes: Sequence[int] = (4, 2, 2, 2)
    strides: Sequence[int] = (4, 2, 2, 2)
    mlp_ratios: Sequence[int] = (8, 8, 4, 4)
    depths: Sequence[int] = (3, 4, 6, 3)
    sr_ratios: Sequence[int] = (8, 4, 2, 1)
    out_indices: Sequence[int] = (0, 1, 2, 3)
    qkv_bias: bool = True
    drop_rate: float = 0.0
    attn_drop_rate: float = 0.0
    drop_path_rate: float = 0.0
    norm_after_stage: bool = True
    pretrained: Optional[str] = None
    init_cfg: Optional[Dict] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        outs = []
        dpr = _dpr(self.drop_path_rate, self.depths)
        done = 0
        for s, (dim, depth) in enumerate(zip(self.embed_dims, self.depths)):
            p = self.patch_sizes[s]
            if p == self.strides[s]:
                # mmcv PatchEmbed(padding='corner'): pad right/bottom so the
                # non-overlapping conv covers the remainder (twins.py:424-431)
                ph = (-x.shape[1]) % self.strides[s]
                pw = (-x.shape[2]) % self.strides[s]
                if ph or pw:
                    x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)))
            x = nn.Conv(dim, (p, p), strides=(self.strides[s],) * 2,
                        padding='VALID' if p == self.strides[s] else
                        ((p // 2,) * 2, (p // 2,) * 2),
                        name=f'patch_embed{s}')(x)
            x = nn.LayerNorm(epsilon=1e-5, name=f'embed_norm{s}')(x)
            for b in range(depth):
                h = nn.LayerNorm(epsilon=1e-5, name=f's{s}_b{b}_norm1')(x)
                h = EfficientAttention(dim, self.num_heads[s],
                                       self.sr_ratios[s], self.qkv_bias,
                                       ln_eps=1e-5,
                                       name=f's{s}_b{b}_attn')(h, train=train)
                x = x + DropPath(dpr[done])(h, train=train)
                h = nn.LayerNorm(epsilon=1e-5, name=f's{s}_b{b}_norm2')(x)
                h = _FFN(dim, dim * self.mlp_ratios[s],
                         name=f's{s}_b{b}_ffn')(h, train=train)
                x = x + DropPath(dpr[done])(h, train=train)
                done += 1
                if b == 0:
                    x = _CPE(dim, name=f'cpe{s}')(x)
            if self.norm_after_stage:
                x = nn.LayerNorm(epsilon=1e-5, name=f'stage_norm{s}')(x)
            outs.append(x)
        return tuple(outs[i] for i in self.out_indices)


@MODELS.register_module()
class SVT(PCPVT):
    """SVT: alternate locally-grouped window attention with global
    sub-sampled attention (even blocks local via small windows, odd blocks
    the PCPVT global path). Window size from ``windiow_sizes``."""
    windiow_sizes: Sequence[int] = (7, 7, 7, 7)  # reference's typo'd key

    @nn.compact
    def __call__(self, x, train: bool = False):
        outs = []
        dpr = _dpr(self.drop_path_rate, self.depths)
        done = 0
        for s, (dim, depth) in enumerate(zip(self.embed_dims, self.depths)):
            p = self.patch_sizes[s]
            if p == self.strides[s]:
                # mmcv PatchEmbed(padding='corner'): pad right/bottom so the
                # non-overlapping conv covers the remainder (twins.py:424-431)
                ph = (-x.shape[1]) % self.strides[s]
                pw = (-x.shape[2]) % self.strides[s]
                if ph or pw:
                    x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)))
            x = nn.Conv(dim, (p, p), strides=(self.strides[s],) * 2,
                        padding='VALID' if p == self.strides[s] else
                        ((p // 2,) * 2, (p // 2,) * 2),
                        name=f'patch_embed{s}')(x)
            x = nn.LayerNorm(epsilon=1e-5, name=f'embed_norm{s}')(x)
            ws = self.windiow_sizes[s]
            for b in range(depth):
                h = nn.LayerNorm(epsilon=1e-5, name=f's{s}_b{b}_norm1')(x)
                if b % 2 == 0:
                    h = self._local_attn(h, dim, self.num_heads[s], ws,
                                         f's{s}_b{b}')
                else:
                    h = EfficientAttention(
                        dim, self.num_heads[s], self.sr_ratios[s],
                        self.qkv_bias, ln_eps=1e-5,
                        name=f's{s}_b{b}_attn')(h, train=train)
                x = x + DropPath(dpr[done])(h, train=train)
                h = nn.LayerNorm(epsilon=1e-5, name=f's{s}_b{b}_norm2')(x)
                h = _FFN(dim, dim * self.mlp_ratios[s],
                         name=f's{s}_b{b}_ffn')(h, train=train)
                x = x + DropPath(dpr[done])(h, train=train)
                done += 1
                if b == 0:
                    x = _CPE(dim, name=f'cpe{s}')(x)
            if self.norm_after_stage:
                x = nn.LayerNorm(epsilon=1e-5, name=f'stage_norm{s}')(x)
            outs.append(x)
        return tuple(outs[i] for i in self.out_indices)

    def _local_attn(self, x, dim, heads, ws, prefix):
        B, H, W, C = x.shape
        pad_h, pad_w = (-H) % ws, (-W) % ws
        h = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
        Hp, Wp = H + pad_h, W + pad_w
        nh, nw = Hp // ws, Wp // ws
        hd = C // heads
        qkv = nn.Dense(3 * C, use_bias=self.qkv_bias,
                       name=f'{prefix}_qkv')(h)
        qkv = qkv.reshape(B, nh, ws, nw, ws, 3, heads, hd)
        qkv = qkv.transpose(5, 0, 1, 3, 6, 2, 4, 7).reshape(
            3, B * nh * nw, heads, ws * ws, hd)
        q, k, v = qkv[0], qkv[1], qkv[2]
        attn = jnp.einsum('bhnd,bhmd->bhnm', q, k,
                          preferred_element_type=jnp.float32) * hd ** -0.5
        if pad_h and pad_w:
            # LSA pad mask (reference twins.py:204-221): real and padded
            # tokens must not attend each other (-1000 additive). NOTE the
            # reference fills with `mask[:, -pad:, :]` unconditionally, so a
            # zero pad on either axis floods the whole mask with 1s and the
            # mask becomes a no-op — effective only when BOTH pads are
            # nonzero; replicated here for checkpoint fidelity.
            import numpy as np
            m = np.zeros((Hp, Wp), np.float32)
            if pad_h:
                m[-pad_h:, :] = 1
            if pad_w:
                m[:, -pad_w:] = 1
            m = m.reshape(nh, ws, nw, ws).transpose(0, 2, 1, 3).reshape(
                nh * nw, ws * ws)
            am = (m[:, None, :] != m[:, :, None]) * -1000.0
            attn = attn.reshape(B, nh * nw, heads, ws * ws, ws * ws)
            attn = attn + jnp.asarray(am, attn.dtype)[None, :, None]
            attn = attn.reshape(B * nh * nw, heads, ws * ws, ws * ws)
        attn = nn.softmax(attn, axis=-1).astype(v.dtype)
        out = jnp.einsum('bhnm,bhmd->bhnd', attn, v,
                         preferred_element_type=jnp.float32).astype(v.dtype)
        out = out.reshape(B, nh, nw, heads, ws, ws, hd)
        out = out.transpose(0, 1, 4, 2, 5, 3, 6).reshape(B, Hp, Wp, C)
        out = out[:, :H, :W]
        return nn.Dense(C, name=f'{prefix}_proj')(out)
