"""Necks: FPN and ICNeck.

Behavioral specs: reference ``mmseg/models/necks/fpn.py`` (lateral 1x1 convs
+ top-down nearest upsample accumulation + 3x3 output convs) and
``mmseg/models/necks/ic_neck.py`` (CascadeFeatureFusion of the ICNet
branches: upsample low, dilated conv vs 1x1 projected high, sum + ReLU; two
fusions returning (24x, 12x, final))."""
from __future__ import annotations

from typing import Dict, Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp

from lednet_tpu.models.layers import ConvModule
from lednet_tpu.ops.resize import resize, resize_bilinear
from lednet_tpu.registry import MODELS


@MODELS.register_module()
class FPN(nn.Module):
    in_channels: Sequence[int]
    out_channels: int
    num_outs: int
    start_level: int = 0
    end_level: int = -1
    add_extra_convs: bool = False
    norm_cfg: Optional[Dict] = None
    act_cfg: Optional[Dict] = None
    upsample_cfg: Optional[Dict] = None
    init_cfg: Optional[Dict] = None

    @nn.compact
    def __call__(self, inputs, train: bool = False):
        assert len(inputs) == len(self.in_channels)
        used = list(range(self.start_level,
                          len(self.in_channels) if self.end_level == -1
                          else self.end_level))
        laterals = [
            ConvModule(self.in_channels[i], self.out_channels, 1,
                       norm_cfg=self.norm_cfg, act_cfg=self.act_cfg,
                       name=f'lateral{i}')(inputs[i], train=train)
            for i in used
        ]
        mode = (self.upsample_cfg or {}).get('mode', 'nearest')
        for i in range(len(laterals) - 1, 0, -1):
            laterals[i - 1] = laterals[i - 1] + resize(
                laterals[i], laterals[i - 1].shape[-3:-1], mode=mode,
                align_corners=False)
        outs = [
            ConvModule(self.out_channels, self.out_channels, 3, padding=1,
                       norm_cfg=self.norm_cfg, act_cfg=self.act_cfg,
                       name=f'fpn{i}')(laterals[i], train=train)
            for i in range(len(laterals))
        ]
        return tuple(outs[:self.num_outs])


class _CascadeFeatureFusion(nn.Module):
    low_channels: int
    high_channels: int
    out_channels: int
    norm_cfg: Optional[Dict] = None
    act_cfg: Optional[Dict] = None
    align_corners: bool = False

    @nn.compact
    def __call__(self, x_low, x_high, train: bool = False):
        norm_cfg = self.norm_cfg or dict(type='BN')
        x_low = resize_bilinear(x_low, x_high.shape[-3:-1],
                                self.align_corners)
        low = ConvModule(self.low_channels, self.out_channels, 3, padding=2,
                         dilation=2, norm_cfg=norm_cfg, act_cfg=None,
                         name='conv_low')(x_low, train=train)
        high = ConvModule(self.high_channels, self.out_channels, 1,
                          norm_cfg=norm_cfg, act_cfg=None,
                          name='conv_high')(x_high, train=train)
        out = nn.relu(low + high)
        return out, low


@MODELS.register_module()
class ICNeck(nn.Module):
    in_channels: Sequence[int] = (64, 256, 256)
    out_channels: int = 128
    norm_cfg: Optional[Dict] = None
    act_cfg: Optional[Dict] = None
    align_corners: bool = False
    init_cfg: Optional[Dict] = None

    @nn.compact
    def __call__(self, inputs, train: bool = False):
        assert len(inputs) == 3
        x_sub1, x_sub2, x_sub4 = inputs
        x_24, low_24 = _CascadeFeatureFusion(
            self.in_channels[2], self.in_channels[1], self.out_channels,
            self.norm_cfg, self.act_cfg, self.align_corners,
            name='cff_24')(x_sub4, x_sub2, train=train)
        x_12, low_12 = _CascadeFeatureFusion(
            self.out_channels, self.in_channels[0], self.out_channels,
            self.norm_cfg, self.act_cfg, self.align_corners,
            name='cff_12')(x_24, x_sub1, train=train)
        return low_24, low_12, x_12
