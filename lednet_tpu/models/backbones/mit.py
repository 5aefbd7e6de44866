"""MiT (Mix Transformer) — the SegFormer backbone.

Behavioral spec: reference ``mmseg/models/backbones/mit.py`` — four stages of
[overlapping patch embed (7/4 then 3/2 convs), efficient multi-head
self-attention with spatial-reduction (sr_ratio) on K/V, MixFFN (1x1 -> 3x3
depthwise -> GELU -> 1x1)], pre-LN residuals, LN after each stage. B0..B5
differ in embed_dims/num_layers.

TPU notes: attention over (H*W, C) tokens with K/V reduced by a strided conv
— batched matmuls the MXU likes; all LayerNorm, no BN.
"""
from __future__ import annotations

from typing import Dict, Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp

from lednet_tpu.models.layers import DropPath, kaiming_init
from lednet_tpu.registry import MODELS


class EfficientAttention(nn.Module):
    dim: int
    num_heads: int
    sr_ratio: int = 1
    qkv_bias: bool = True
    # SegFormer's norm_cfg sets LN eps=1e-6; Twins reuses this block with
    # the torch-default 1e-5 (reference twins.py:63 norm_cfg LN default).
    ln_eps: float = 1e-6

    @nn.compact
    def __call__(self, x, train: bool = False):
        B, H, W, C = x.shape
        head_dim = C // self.num_heads
        q = nn.Dense(C, use_bias=self.qkv_bias, name='q')(x)
        q = q.reshape(B, H * W, self.num_heads, head_dim)

        kv_in = x
        if self.sr_ratio > 1:
            # torch Conv2d(k=sr, s=sr) truncates the remainder (pad 0)
            kv_in = nn.Conv(C, (self.sr_ratio, self.sr_ratio),
                            strides=(self.sr_ratio, self.sr_ratio),
                            padding='VALID', name='sr')(x)
            kv_in = nn.LayerNorm(epsilon=self.ln_eps, name='sr_norm')(kv_in)
        kv = nn.Dense(2 * C, use_bias=self.qkv_bias, name='kv')(kv_in)
        n_kv = kv_in.shape[1] * kv_in.shape[2]
        kv = kv.reshape(B, n_kv, 2, self.num_heads, head_dim)
        k, v = kv[:, :, 0], kv[:, :, 1]

        attn = jnp.einsum('bnhd,bmhd->bhnm', q, k,
                          preferred_element_type=jnp.float32)
        attn = nn.softmax(attn * head_dim ** -0.5, axis=-1).astype(v.dtype)
        out = jnp.einsum('bhnm,bmhd->bnhd', attn, v,
                         preferred_element_type=jnp.float32).astype(v.dtype)
        out = out.reshape(B, H, W, C)
        return nn.Dense(C, name='proj')(out)


class MixFFN(nn.Module):
    dim: int
    hidden_dim: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Dense(self.hidden_dim, name='fc1')(x)
        x = nn.Conv(self.hidden_dim, (3, 3), padding=((1, 1), (1, 1)),
                    feature_group_count=self.hidden_dim, name='dw')(x)
        x = nn.gelu(x, approximate=False)
        return nn.Dense(self.dim, name='fc2')(x)


@MODELS.register_module()
class MixVisionTransformer(nn.Module):
    in_channels: int = 3
    embed_dims: int = 64
    num_stages: int = 4
    num_layers: Sequence[int] = (3, 4, 6, 3)
    num_heads: Sequence[int] = (1, 2, 4, 8)
    patch_sizes: Sequence[int] = (7, 3, 3, 3)
    strides: Sequence[int] = (4, 2, 2, 2)
    sr_ratios: Sequence[int] = (8, 4, 2, 1)
    out_indices: Sequence[int] = (0, 1, 2, 3)
    mlp_ratio: int = 4
    qkv_bias: bool = True
    drop_rate: float = 0.0
    attn_drop_rate: float = 0.0
    drop_path_rate: float = 0.0
    norm_cfg: Optional[Dict] = None
    act_cfg: Optional[Dict] = None
    pretrained: Optional[str] = None
    init_cfg: Optional[Dict] = None
    with_cp: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        outs = []
        total = sum(self.num_layers)
        dpr = [self.drop_path_rate * k / max(total - 1, 1)
               for k in range(total)]
        done = 0
        for i in range(self.num_stages):
            dim = self.embed_dims * self.num_heads[i]
            p = self.patch_sizes[i]
            x = nn.Conv(dim, (p, p), strides=(self.strides[i], self.strides[i]),
                        padding=((p // 2, p // 2), (p // 2, p // 2)),
                        kernel_init=kaiming_init,
                        name=f'patch_embed{i}')(x)
            x = nn.LayerNorm(name=f'embed_norm{i}')(x)
            for j in range(self.num_layers[i]):
                h = nn.LayerNorm(name=f's{i}_b{j}_norm1')(x)
                h = EfficientAttention(dim, self.num_heads[i],
                                       self.sr_ratios[i], self.qkv_bias,
                                       name=f's{i}_b{j}_attn')(h, train=train)
                x = x + DropPath(dpr[done])(h, train=train)
                h = nn.LayerNorm(name=f's{i}_b{j}_norm2')(x)
                h = MixFFN(dim, dim * self.mlp_ratio,
                           name=f's{i}_b{j}_ffn')(h, train=train)
                x = x + DropPath(dpr[done])(h, train=train)
                done += 1
            x = nn.LayerNorm(name=f'stage_norm{i}')(x)
            outs.append(x)
        return tuple(outs[i] for i in self.out_indices)


MODELS.register_module(name='MIT', module=MixVisionTransformer)
