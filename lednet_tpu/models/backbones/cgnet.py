"""CGNet backbone.

Behavioral spec: reference ``mmseg/models/backbones/cgnet.py`` — a
Context-Guided network: stem of 3 convs (first s2), then two CG stages.
Each ContextGuidedBlock: local 3x3 conv + surrounding dilated 3x3 conv
(channel-wise), concat -> BN+PReLU, global-context channel gate; stage
inputs are concatenated with an avg-pooled image pyramid. Norms are BN,
activations PReLU. Returns the three stage outputs.
"""
from __future__ import annotations

from typing import Dict, Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp

from lednet_tpu.models.layers import ConvModule, Norm2d, PReLU, kaiming_init
from lednet_tpu.ops import avg_pool2d, global_avg_pool
from lednet_tpu.registry import MODELS


class GlobalContextExtractor(nn.Module):
    channels: int
    reduction: int = 16

    @nn.compact
    def __call__(self, x):
        g = global_avg_pool(x)[:, 0, 0, :]
        g = nn.Dense(self.channels // self.reduction, name='fc1')(g)
        g = nn.relu(g)
        g = nn.Dense(self.channels, name='fc2')(g)
        g = nn.sigmoid(g)
        return x * g[:, None, None, :]


class ContextGuidedBlock(nn.Module):
    in_channels: int
    out_channels: int
    dilation: int = 2
    reduction: int = 16
    downsample: bool = False
    skip_connect: bool = True
    norm_cfg: Optional[Dict] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        norm_cfg = self.norm_cfg or dict(type='BN')
        channels = self.out_channels if self.downsample else self.out_channels // 2
        stride = 2 if self.downsample else 1
        ksize = 3 if self.downsample else 1
        pad = (ksize - 1) // 2

        h = nn.Conv(channels, (ksize, ksize), strides=(stride, stride),
                    padding=((pad, pad), (pad, pad)), use_bias=False,
                    kernel_init=kaiming_init, name='conv1x1')(x)
        h = Norm2d(norm_cfg, name='norm1')(h, train=train)
        h = PReLU(channels, name='act1')(h)

        loc = nn.Conv(channels, (3, 3), padding=((1, 1), (1, 1)),
                      feature_group_count=channels, use_bias=False,
                      kernel_init=kaiming_init, name='f_loc')(h)
        d = self.dilation
        sur = nn.Conv(channels, (3, 3), padding=((d, d), (d, d)),
                      kernel_dilation=(d, d), feature_group_count=channels,
                      use_bias=False, kernel_init=kaiming_init,
                      name='f_sur')(h)
        joi = jnp.concatenate([loc, sur], axis=-1)
        joi = Norm2d(norm_cfg, name='bn')(joi, train=train)
        joi = PReLU(2 * channels, name='act2')(joi)
        if self.downsample:
            joi = nn.Conv(self.out_channels, (1, 1), use_bias=False,
                          kernel_init=kaiming_init, name='reduce')(joi)
        out = GlobalContextExtractor(self.out_channels,
                                     self.reduction, name='f_glo')(joi)
        if self.skip_connect and not self.downsample:
            out = x + out
        return out


@MODELS.register_module()
class CGNet(nn.Module):
    in_channels: int = 3
    num_channels: Sequence[int] = (32, 64, 128)
    num_blocks: Sequence[int] = (3, 21)
    dilations: Sequence[int] = (2, 4)
    reductions: Sequence[int] = (8, 16)
    norm_cfg: Optional[Dict] = None
    act_cfg: Optional[Dict] = None
    init_cfg: Optional[Dict] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        norm_cfg = self.norm_cfg or dict(type='BN')
        c0, c1, c2 = self.num_channels
        inp = x

        # stem: three 3x3 convs, first stride 2; conv+BN+PReLU
        h = x
        cur = self.in_channels
        for i in range(3):
            h = nn.Conv(c0, (3, 3), strides=(2 if i == 0 else 1, ) * 2,
                        padding=((1, 1), (1, 1)), use_bias=False,
                        kernel_init=kaiming_init, name=f'stem{i}')(h)
            h = Norm2d(norm_cfg, name=f'stem_norm{i}')(h, train=train)
            h = PReLU(c0, name=f'stem_act{i}')(h)
            cur = c0

        # input injections (avg-pooled image pyramids)
        inp_down1 = avg_pool2d(inp, 3, 2, 1)
        inp_down2 = avg_pool2d(inp_down1, 3, 2, 1)

        h = jnp.concatenate([h, inp_down1], axis=-1)
        h = Norm2d(norm_cfg, name='norm_prelu_0')(h, train=train)
        h = PReLU(h.shape[-1], name='act_prelu_0')(h)
        out0 = h

        # stage 1 (to 1/4)
        for i in range(self.num_blocks[0]):
            h = ContextGuidedBlock(h.shape[-1] if i == 0 else c1, c1,
                                   self.dilations[0], self.reductions[0],
                                   downsample=(i == 0), norm_cfg=norm_cfg,
                                   name=f'level1_{i}')(h, train=train)
            if i == 0:
                down1 = h
        h = jnp.concatenate([h, down1, inp_down2], axis=-1)
        h = Norm2d(norm_cfg, name='norm_prelu_1')(h, train=train)
        h = PReLU(h.shape[-1], name='act_prelu_1')(h)
        out1 = h

        # stage 2 (to 1/8)
        for i in range(self.num_blocks[1]):
            h = ContextGuidedBlock(h.shape[-1] if i == 0 else c2, c2,
                                   self.dilations[1], self.reductions[1],
                                   downsample=(i == 0), norm_cfg=norm_cfg,
                                   name=f'level2_{i}')(h, train=train)
            if i == 0:
                down2 = h
        h = jnp.concatenate([down2, h], axis=-1)
        h = Norm2d(norm_cfg, name='norm_prelu_2')(h, train=train)
        h = PReLU(h.shape[-1], name='act_prelu_2')(h)
        return out0, out1, h
