"""MSCAN — the SegNeXt backbone (multi-scale convolutional attention).

Behavioral spec: reference ``mmseg/models/backbones/mscan.py`` — conv stem to
1/4, four stages of MSCA blocks: attention = 5x5 dw conv + three strip-conv
pairs (1x7/7x1, 1x11/11x1, 1x21/21x1) summed, 1x1 mix, gate by multiplication;
FFN = 1x1 -> 3x3 dw -> GELU -> 1x1; BN norms, per-block LayerScale.
"""
from __future__ import annotations

from typing import Dict, Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp

from lednet_tpu.models.layers import (ConvModule, DropPath, Norm2d,
                                      kaiming_init)
from lednet_tpu.registry import MODELS


class MSCAAttention(nn.Module):
    dim: int
    kernel_sizes: Sequence[int] = (5, 7, 11, 21)

    @nn.compact
    def __call__(self, x):
        d = self.dim
        k0 = self.kernel_sizes[0]
        attn = nn.Conv(d, (k0, k0), padding=((k0 // 2,) * 2, (k0 // 2,) * 2),
                       feature_group_count=d, name='conv0')(x)
        total = attn
        for i, k in enumerate(self.kernel_sizes[1:]):
            h = nn.Conv(d, (1, k), padding=((0, 0), (k // 2, k // 2)),
                        feature_group_count=d, name=f'conv{i + 1}_1')(attn)
            h = nn.Conv(d, (k, 1), padding=((k // 2, k // 2), (0, 0)),
                        feature_group_count=d, name=f'conv{i + 1}_2')(h)
            total = total + h
        mixed = nn.Conv(d, (1, 1), name='conv_mix')(total)
        return mixed * x


class MSCABlock(nn.Module):
    dim: int
    mlp_ratio: float = 4.0
    layer_scale_init: float = 1e-2
    drop_path: float = 0.0

    @nn.compact
    def __call__(self, x, train: bool = False):
        d = self.dim
        ls1 = self.param('layer_scale_1', nn.initializers.constant(
            self.layer_scale_init), (d,), jnp.float32)
        ls2 = self.param('layer_scale_2', nn.initializers.constant(
            self.layer_scale_init), (d,), jnp.float32)

        hn = Norm2d(dict(type='BN'), name='norm1')(x, train=train)
        h = nn.Conv(d, (1, 1), name='proj_1')(hn)
        h = nn.gelu(h, approximate=False)
        h = MSCAAttention(d, name='attn')(h)
        h = nn.Conv(d, (1, 1), name='proj_2')(h)
        # MSCASpatialAttention adds its OWN shortcut of the normed input
        # (reference mscan.py:210-216) before the layer-scaled outer residual
        h = h + hn
        x = x + DropPath(self.drop_path)(ls1.astype(x.dtype) * h,
                                         train=train)

        h = Norm2d(dict(type='BN'), name='norm2')(x, train=train)
        hidden = int(d * self.mlp_ratio)
        h = nn.Conv(hidden, (1, 1), name='fc1')(h)
        h = nn.Conv(hidden, (3, 3), padding=((1, 1), (1, 1)),
                    feature_group_count=hidden, name='dw')(h)
        h = nn.gelu(h, approximate=False)
        h = nn.Conv(d, (1, 1), name='fc2')(h)
        return x + DropPath(self.drop_path)(ls2.astype(x.dtype) * h,
                                            train=train)


@MODELS.register_module()
class MSCAN(nn.Module):
    in_channels: int = 3
    embed_dims: Sequence[int] = (32, 64, 160, 256)
    depths: Sequence[int] = (3, 3, 5, 2)
    mlp_ratios: Sequence[float] = (8, 8, 4, 4)
    out_indices: Sequence[int] = (0, 1, 2, 3)
    drop_rate: float = 0.0
    drop_path_rate: float = 0.0
    norm_cfg: Optional[Dict] = None
    act_cfg: Optional[Dict] = None
    pretrained: Optional[str] = None
    init_cfg: Optional[Dict] = None
    attention_kernel_sizes: Sequence = (5, (1, 7), (1, 11), (1, 21))
    attention_kernel_paddings: Sequence = (2, (0, 3), (0, 5), (0, 10))

    @nn.compact
    def __call__(self, x, train: bool = False):
        outs = []
        total = sum(self.depths)
        dpr = [self.drop_path_rate * k / max(total - 1, 1)
               for k in range(total)]
        done = 0
        for i, (dim, depth) in enumerate(zip(self.embed_dims, self.depths)):
            if i == 0:
                # stem: two 3x3 s2 convs; the reference uses plain
                # nn.Conv2d (bias=True) before each BN (mscan.py:85-105),
                # so keep the bias for 1:1 checkpoint transplants
                x = ConvModule(self.in_channels, dim // 2, 3, stride=2,
                               padding=1, bias=True, norm_cfg=dict(type='BN'),
                               act_cfg=dict(type='GELU'),
                               name='stem1')(x, train=train)
                x = ConvModule(dim // 2, dim, 3, stride=2, padding=1,
                               bias=True, norm_cfg=dict(type='BN'),
                               act_cfg=None, name='stem2')(x, train=train)
            else:
                x = nn.Conv(dim, (3, 3), strides=(2, 2),
                            padding=((1, 1), (1, 1)), kernel_init=kaiming_init,
                            name=f'down{i}')(x)
                x = Norm2d(dict(type='BN'), name=f'down_norm{i}')(x, train=train)
            for j in range(depth):
                x = MSCABlock(dim, self.mlp_ratios[i],
                              drop_path=dpr[done],
                              name=f's{i}_b{j}')(x, train=train)
                done += 1
            # reference mscan.py:424 uses plain nn.LayerNorm (torch eps=1e-5)
            x = nn.LayerNorm(epsilon=1e-5, name=f'stage_norm{i}')(x)
            outs.append(x)
        return tuple(outs[i] for i in self.out_indices)
