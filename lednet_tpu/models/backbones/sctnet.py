"""SCTNet backbone (single-branch CNN with conv-former blocks).

Behavioral spec: reference ``mmseg/models/backbones/sctnet.py:11-471``:
stem to 1/4, BasicBlock stages to 4c@1/16, CFBlocks (ConvolutionalAttention:
learned 7x1 / 1x7 strip-kernel banks applied as conv, per-head spatial
softmax + channel normalization, transposed-kernel projection back; MLP =
BN -> 3x3 conv -> GELU -> 3x3 conv) at 1/16 and 1/32, DAPPM head compressed
to 2c and upsampled to 1/8 where it concatenates with the 2c stage-2
feature. Output: (concat@1/8 [4c], stage2@1/8 [2c]) — the reference also
returns alignment taps for its distillation losses, which our segmentor
surface does not consume.
"""
from __future__ import annotations

from typing import Dict, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from lednet_tpu.models.layers import (ConvModule, DropPath, Norm2d,
                                      kaiming_init)
from lednet_tpu.models.ppm import DAPPM
from lednet_tpu.ops.resize import resize_bilinear
from lednet_tpu.registry import MODELS

_BN = dict(type='BN')
_RELU = dict(type='ReLU')


class _SCTBasicBlock(nn.Module):
    in_channels: int
    out_channels: int
    stride: int = 1
    no_relu: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        out = ConvModule(self.in_channels, self.out_channels, 3,
                         stride=self.stride, padding=1, bias=True,
                         norm_cfg=_BN, act_cfg=_RELU, name='conv1')(x, train=train)
        out = ConvModule(self.out_channels, self.out_channels, 3, padding=1,
                         bias=True, norm_cfg=_BN, act_cfg=None,
                         name='conv2')(out, train=train)
        residual = x
        if self.stride != 1 or self.in_channels != self.out_channels:
            residual = ConvModule(self.in_channels, self.out_channels, 1,
                                  stride=self.stride, bias=True, norm_cfg=_BN,
                                  act_cfg=None, name='down')(x, train=train)
        out = out + residual
        return out if self.no_relu else nn.relu(out)


class ConvolutionalAttention(nn.Module):
    in_channels: int
    out_channels: int
    inter_channels: int = 64
    num_heads: int = 8

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = Norm2d(_BN, name='norm')(x, train=train)
        kv = self.param('kv', nn.initializers.truncated_normal(0.001),
                        (7, 1, self.in_channels, self.inter_channels),
                        jnp.float32)
        kv3 = self.param('kv3', nn.initializers.truncated_normal(0.001),
                         (1, 7, self.in_channels, self.inter_channels),
                         jnp.float32)

        def act_dn(h):
            B, H, W, C = h.shape
            per = C // self.num_heads
            flat = h.reshape(B, H * W, self.num_heads, per)
            flat = nn.softmax(flat.astype(jnp.float32), axis=1)
            flat = flat / (jnp.sum(flat, axis=3, keepdims=True) + 1e-6)
            return flat.astype(h.dtype).reshape(B, H, W, C)

        def strip(kernel, pad):
            h = jax.lax.conv_general_dilated(
                x, kernel.astype(x.dtype), (1, 1), pad,
                dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
            h = act_dn(h)
            # transposed bank: (kh, kw, inter, in)
            back = jnp.swapaxes(kernel, 2, 3)
            return jax.lax.conv_general_dilated(
                h, back.astype(x.dtype), (1, 1), pad,
                dimension_numbers=('NHWC', 'HWIO', 'NHWC'))

        return strip(kv, ((3, 3), (0, 0))) + strip(kv3, ((0, 0), (3, 3)))


class CFBlock(nn.Module):
    channels: int
    num_heads: int = 8
    drop_path: float = 0.0

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = ConvolutionalAttention(self.channels, self.channels,
                                   num_heads=self.num_heads,
                                   name='attn')(x, train=train)
        x = x + DropPath(self.drop_path)(h, train=train)
        h = Norm2d(dict(type='BN', eps=1e-6), name='mlp_norm')(x, train=train)
        h = nn.Conv(self.channels, (3, 3), padding=((1, 1), (1, 1)),
                    kernel_init=kaiming_init, name='mlp_conv1')(h)
        h = nn.gelu(h, approximate=False)
        h = nn.Conv(self.channels, (3, 3), padding=((1, 1), (1, 1)),
                    kernel_init=kaiming_init, name='mlp_conv2')(h)
        return x + DropPath(self.drop_path)(h, train=train)


@MODELS.register_module()
class SCTNet(nn.Module):
    layer_nums: Sequence[int] = (2, 2, 2, 2)
    base_channels: int = 64
    spp_channels: int = 128
    in_channels: int = 3
    num_heads: int = 8
    drop_rate: float = 0.0
    drop_path_rate: float = 0.1
    pretrained: Optional[str] = None
    init_cfg: Optional[Dict] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = self.base_channels
        h = ConvModule(self.in_channels, c, 3, stride=2, padding=1, bias=True,
                       norm_cfg=_BN, act_cfg=_RELU, name='stem1')(x, train=train)
        h = ConvModule(c, c, 3, stride=2, padding=1, bias=True, norm_cfg=_BN,
                       act_cfg=_RELU, name='stem2')(h, train=train)

        def stage(h, in_ch, out_ch, n, stride, name):
            for i in range(n):
                h = _SCTBasicBlock(in_ch if i == 0 else out_ch, out_ch,
                                   stride if i == 0 else 1,
                                   no_relu=(i == n - 1),
                                   name=f'{name}_{i}')(h, train=train)
            return h

        x1 = stage(h, c, c, self.layer_nums[0], 1, 'layer1')         # 1/4
        x2 = stage(nn.relu(x1), c, 2 * c, self.layer_nums[1], 2,
                   'layer2')                                          # 1/8
        x3 = stage(nn.relu(x2), 2 * c, 4 * c, self.layer_nums[2], 2,
                   'layer3')                                          # 1/16
        x3 = CFBlock(4 * c, self.num_heads, self.drop_path_rate,
                     name='layer3_2')(nn.relu(x3), train=train)
        x4 = ConvModule(4 * c, 8 * c, 3, stride=2, padding=1, bias=True,
                        norm_cfg=_BN, act_cfg=_RELU,
                        name='convdown4')(x3, train=train)            # 1/32
        x4 = CFBlock(8 * c, self.num_heads, self.drop_path_rate,
                     name='layer4')(nn.relu(x4), train=train)
        x5 = CFBlock(8 * c, self.num_heads, self.drop_path_rate,
                     name='layer5')(nn.relu(x4), train=train)
        # Reference's DAPPM_head (sctnet.py:362-471) uses plain Conv2d
        # (bias=True), unlike DDRNet's bias-free ConvModule DAPPM.
        x6 = DAPPM(8 * c, self.spp_channels, 2 * c, num_scales=5,
                   conv_bias=True, name='spp')(x5, train=train)
        x7 = resize_bilinear(x6, x2.shape[-3:-1], False)
        x_out = jnp.concatenate([x2, x7], axis=-1)                    # 4c 1/8
        return x_out, x2
