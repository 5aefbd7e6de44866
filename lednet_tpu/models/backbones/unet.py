"""UNet backbone.

Behavioral spec: reference ``mmseg/models/backbones/unet.py`` — classic
encoder/decoder with per-stage double 3x3 convs, maxpool downsampling,
bilinear-upsample + skip-concat decoding; returns all decoder scales
(deepest first ... finest last, matching mmseg's out ordering of
``[enc_outs..., dec_outs...]`` trimmed to the decoder pyramid).
"""
from __future__ import annotations

from typing import Dict, Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp

from lednet_tpu.models.layers import ConvModule
from lednet_tpu.ops import max_pool2d
from lednet_tpu.ops.resize import resize_bilinear
from lednet_tpu.registry import MODELS


class _ConvBlock(nn.Module):
    in_channels: int
    out_channels: int
    num_convs: int = 2
    dilation: int = 1
    norm_cfg: Optional[Dict] = None
    act_cfg: Optional[Dict] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        norm_cfg = self.norm_cfg or dict(type='BN')
        act_cfg = self.act_cfg or dict(type='ReLU')
        for i in range(self.num_convs):
            x = ConvModule(self.in_channels if i == 0 else self.out_channels,
                           self.out_channels, 3, padding=self.dilation,
                           dilation=self.dilation, norm_cfg=norm_cfg,
                           act_cfg=act_cfg, name=f'conv{i}')(x, train=train)
        return x


@MODELS.register_module()
class UNet(nn.Module):
    in_channels: int = 3
    base_channels: int = 64
    num_stages: int = 5
    strides: Sequence[int] = (1, 1, 1, 1, 1)
    enc_num_convs: Sequence[int] = (2, 2, 2, 2, 2)
    dec_num_convs: Sequence[int] = (2, 2, 2, 2)
    downsamples: Sequence[bool] = (True, True, True, True)
    enc_dilations: Sequence[int] = (1, 1, 1, 1, 1)
    dec_dilations: Sequence[int] = (1, 1, 1, 1)
    norm_cfg: Optional[Dict] = None
    act_cfg: Optional[Dict] = None
    upsample_cfg: Optional[Dict] = None
    norm_eval: bool = False
    pretrained: Optional[str] = None
    init_cfg: Optional[Dict] = None
    with_cp: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        enc_outs = []
        in_ch = self.in_channels
        for i in range(self.num_stages):
            ch = self.base_channels * 2 ** i
            if i > 0 and self.downsamples[i - 1]:
                x = max_pool2d(x, 2, 2, 0)
            x = _ConvBlock(in_ch, ch, self.enc_num_convs[i],
                           self.enc_dilations[i], self.norm_cfg, self.act_cfg,
                           name=f'enc{i}')(x, train=train)
            enc_outs.append(x)
            in_ch = ch

        dec_outs = [x]
        for i in range(self.num_stages - 2, -1, -1):
            skip = enc_outs[i]
            ch = self.base_channels * 2 ** i
            up = resize_bilinear(x, skip.shape[-3:-1], False)
            up = ConvModule(x.shape[-1], ch, 1,
                            norm_cfg=self.norm_cfg or dict(type='BN'),
                            act_cfg=self.act_cfg or dict(type='ReLU'),
                            name=f'up{i}')(up, train=train)
            x = _ConvBlock(2 * ch, ch, self.dec_num_convs[i],
                           self.dec_dilations[i], self.norm_cfg, self.act_cfg,
                           name=f'dec{i}')(
                jnp.concatenate([skip, up], axis=-1), train=train)
            dec_outs.append(x)
        return tuple(dec_outs)
