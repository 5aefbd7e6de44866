"""PIDNet backbone (P/I/D three-branch real-time segmenter).

Behavioral spec from the reference ``mmseg/models/backbones/pidnet.py:18-525``:

- PagFM (``:18-94``): pixel-attention-guided fusion — ``sigma =
  sigmoid(sum(f_p * up(f_i)))``; ``out = sigma * up(x_i) + (1-sigma) * x_p``,
- Bag (``:97-146``) / LightBag (``:149-197``): boundary-attention-guided
  fusion of the three branches,
- stem to 2c@1/8; I branch 4c@1/16 -> 8c@1/32 -> Bottleneck 16c@1/64 with
  PAPPM (s) or DAPPM (m/l); P branch at 2c@1/8 fused from I via PagFM; D
  branch fed by 3x3 'diff' convs from I; the fork sizes the 1/8 maps with
  ``math.ceil`` (``:475-476``),
- always returns ``(temp_p, out, temp_d)``; eval consumers use ``out`` only.
"""
from __future__ import annotations

from typing import Dict, Optional

import flax.linen as nn
import jax.numpy as jnp

from lednet_tpu.models.backbones.ddrnet import _Stage
from lednet_tpu.models.layers import (BasicBlock, Bottleneck, ConvModule)
from lednet_tpu.models.ppm import DAPPM, PAPPM
from lednet_tpu.ops.resize import resize_bilinear
from lednet_tpu.registry import MODELS


class PagFM(nn.Module):
    in_channels: int
    channels: int
    after_relu: bool = False
    with_channel: bool = False
    norm_cfg: Optional[Dict] = None

    @nn.compact
    def __call__(self, x_p, x_i, train: bool = False):
        norm_cfg = self.norm_cfg or dict(type='BN')
        if self.after_relu:
            x_p, x_i = nn.relu(x_p), nn.relu(x_i)
        f_i = ConvModule(self.in_channels, self.channels, 1, norm_cfg=norm_cfg,
                         act_cfg=None, name='f_i')(x_i, train=train)
        f_i = resize_bilinear(f_i, x_p.shape[-3:-1], align_corners=False)
        f_p = ConvModule(self.in_channels, self.channels, 1, norm_cfg=norm_cfg,
                         act_cfg=None, name='f_p')(x_p, train=train)
        if self.with_channel:
            sigma = nn.sigmoid(ConvModule(self.channels, self.in_channels, 1,
                                          norm_cfg=norm_cfg, act_cfg=None,
                                          name='up')(f_p * f_i, train=train))
        else:
            sigma = nn.sigmoid(jnp.sum(f_p * f_i, axis=-1, keepdims=True))
        x_i = resize_bilinear(x_i, x_p.shape[-3:-1], align_corners=False)
        return sigma * x_i + (1 - sigma) * x_p


class Bag(nn.Module):
    in_channels: int
    out_channels: int
    norm_cfg: Optional[Dict] = None
    act_cfg: Optional[Dict] = None

    @nn.compact
    def __call__(self, x_p, x_i, x_d, train: bool = False):
        sigma = nn.sigmoid(x_d)
        return ConvModule(self.in_channels, self.out_channels, 3, padding=1,
                          norm_cfg=self.norm_cfg or dict(type='BN'),
                          act_cfg=self.act_cfg or dict(type='ReLU'),
                          order=('norm', 'act', 'conv'),
                          name='conv')(sigma * x_p + (1 - sigma) * x_i,
                                       train=train)


class LightBag(nn.Module):
    in_channels: int
    out_channels: int
    norm_cfg: Optional[Dict] = None
    act_cfg: Optional[Dict] = None

    @nn.compact
    def __call__(self, x_p, x_i, x_d, train: bool = False):
        norm_cfg = self.norm_cfg or dict(type='BN')
        sigma = nn.sigmoid(x_d)
        f_p = ConvModule(self.in_channels, self.out_channels, 1,
                         norm_cfg=norm_cfg, act_cfg=self.act_cfg,
                         name='f_p')((1 - sigma) * x_i + x_p, train=train)
        f_i = ConvModule(self.in_channels, self.out_channels, 1,
                         norm_cfg=norm_cfg, act_cfg=self.act_cfg,
                         name='f_i')(x_i + sigma * x_p, train=train)
        return f_p + f_i


@MODELS.register_module()
class PIDNet(nn.Module):
    in_channels: int = 3
    channels: int = 64
    ppm_channels: int = 96
    num_stem_blocks: int = 2
    num_branch_blocks: int = 3
    align_corners: bool = False
    norm_cfg: Optional[Dict] = None
    act_cfg: Optional[Dict] = None
    init_cfg: Optional[Dict] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = self.channels
        norm_cfg = self.norm_cfg or dict(type='BN')
        act_cfg = self.act_cfg or dict(type='ReLU')
        out_size = (-(-x.shape[-3] // 8), -(-x.shape[-2] // 8))
        light = self.num_stem_blocks == 2  # PIDNet-S variant

        # stem to 2c @ 1/8
        h = ConvModule(self.in_channels, c, 3, stride=2, padding=1,
                       norm_cfg=norm_cfg, act_cfg=act_cfg,
                       name='stem_conv1')(x, train=train)
        h = ConvModule(c, c, 3, stride=2, padding=1, norm_cfg=norm_cfg,
                       act_cfg=act_cfg, name='stem_conv2')(h, train=train)
        h = _Stage(BasicBlock, c, c, self.num_stem_blocks, norm_cfg=norm_cfg,
                   name='stem_layer1')(h, train=train)
        h = nn.relu(h)
        h = _Stage(BasicBlock, c, 2 * c, self.num_stem_blocks, stride=2,
                   norm_cfg=norm_cfg, name='stem_layer2')(h, train=train)
        stem = nn.relu(h)

        # stage 2
        x_i = nn.relu(_Stage(BasicBlock, 2 * c, 4 * c, self.num_branch_blocks,
                             stride=2, norm_cfg=norm_cfg,
                             name='i_layer1')(stem, train=train))     # 1/16
        x_p = _Stage(BasicBlock, 2 * c, 2 * c, self.num_stem_blocks,
                     norm_cfg=norm_cfg, name='p_layer1')(stem, train=train)
        if light:
            x_d = BasicBlock(2 * c, c, downsample=True, norm_cfg=norm_cfg,
                             act_out=False, name='d_layer1')(stem, train=train)
        else:
            x_d = BasicBlock(2 * c, 2 * c, norm_cfg=norm_cfg, act_out=False,
                             name='d_layer1')(stem, train=train)

        comp_i = ConvModule(4 * c, 2 * c, 1, norm_cfg=norm_cfg, act_cfg=None,
                            name='compression_1')(x_i, train=train)
        x_p = PagFM(2 * c, c, name='pag_1')(x_p, comp_i, train=train)
        diff_i = ConvModule(4 * c, c if light else 2 * c, 3, padding=1,
                            norm_cfg=norm_cfg, act_cfg=None,
                            name='diff_1')(x_i, train=train)
        x_d = x_d + resize_bilinear(diff_i, out_size, self.align_corners)
        temp_p = x_p

        # stage 3
        x_i = nn.relu(_Stage(BasicBlock, 4 * c, 8 * c, self.num_branch_blocks,
                             stride=2, norm_cfg=norm_cfg,
                             name='i_layer2')(x_i, train=train))      # 1/32
        x_p = _Stage(BasicBlock, 2 * c, 2 * c, self.num_stem_blocks,
                     norm_cfg=norm_cfg, name='p_layer2')(nn.relu(x_p),
                                                         train=train)
        if light:
            x_d = _Stage(Bottleneck, c, c, 1, norm_cfg=norm_cfg,
                         name='d_layer2')(nn.relu(x_d), train=train)  # 2c
        else:
            x_d = BasicBlock(2 * c, 2 * c, norm_cfg=norm_cfg, act_out=False,
                             name='d_layer2')(nn.relu(x_d), train=train)

        comp_i = ConvModule(8 * c, 2 * c, 1, norm_cfg=norm_cfg, act_cfg=None,
                            name='compression_2')(x_i, train=train)
        x_p = PagFM(2 * c, c, name='pag_2')(x_p, comp_i, train=train)
        diff_i = ConvModule(8 * c, 2 * c, 3, padding=1, norm_cfg=norm_cfg,
                            act_cfg=None, name='diff_2')(x_i, train=train)
        x_d = x_d + resize_bilinear(diff_i, out_size, self.align_corners)
        temp_d = x_d

        # stage 4
        x_i = _Stage(Bottleneck, 8 * c, 8 * c, 2, stride=2, norm_cfg=norm_cfg,
                     name='i_layer3')(x_i, train=train)               # 1/64
        x_p = _Stage(Bottleneck, 2 * c, 2 * c, 1, norm_cfg=norm_cfg,
                     name='p_layer3')(nn.relu(x_p), train=train)
        x_d = _Stage(Bottleneck, 2 * c, 2 * c, 1, norm_cfg=norm_cfg,
                     name='d_layer3')(nn.relu(x_d), train=train)

        spp_cls = PAPPM if light else DAPPM
        x_i = spp_cls(16 * c, self.ppm_channels, 4 * c, num_scales=5,
                      name='spp')(x_i, train=train)
        x_i = resize_bilinear(x_i, out_size, self.align_corners)
        dfm_cls = LightBag if light else Bag
        out = dfm_cls(4 * c, 4 * c, norm_cfg=norm_cfg,
                      act_cfg=None if light else act_cfg,
                      name='dfm')(x_p, x_i, x_d, train=train)
        return temp_p, out, temp_d
