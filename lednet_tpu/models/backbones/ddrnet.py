"""DDRNet backbone (deep dual-resolution network).

Behavioral spec from the reference ``mmseg/models/backbones/ddrnet.py:35-224``:
stem to 1/8 (two s2 convs + 2 BasicBlocks + 2 BasicBlocks to 2c@1/8), a
3-stage context branch (4c@1/16, 8c@1/32, Bottleneck 16c@1/64), a 3-stage
spatial branch at 2c@1/8, two bilateral fusions (1x1 compression conv into
spatial via bilinear resize; 3x3 s2 down conv(s) into context), DAPPM on the
context output resized back to 1/8. The fork sizes outputs with
``math.ceil(/8)`` (``ddrnet.py:185``), reproduced here.

Returns ``(temp_context, x_s + x_c)`` always; ``temp_context`` (the spatial
feature after the first fusion) is the auxiliary-head input
(``ddrnet.py:200-224``). Heads that only need the final feature ignore it.
"""
from __future__ import annotations

from typing import Dict, Optional

import flax.linen as nn

from lednet_tpu.models.layers import BasicBlock, Bottleneck, ConvModule
from lednet_tpu.models.ppm import DAPPM
from lednet_tpu.ops.resize import resize_bilinear
from lednet_tpu.registry import MODELS


class _Stage(nn.Module):
    """A sequence of residual blocks; last block has no output activation,
    mirroring the reference's ``_make_layer`` (``ddrnet.py:151-180``)."""
    block: type
    in_channels: int
    channels: int
    num_blocks: int
    stride: int = 1
    norm_cfg: Optional[Dict] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        expansion = 2 if self.block is Bottleneck else 1
        needs_down = self.stride != 1 or self.in_channels != self.channels * expansion
        x = self.block(self.in_channels, self.channels, stride=self.stride,
                       downsample=needs_down, norm_cfg=self.norm_cfg,
                       act_out=True if self.block is BasicBlock else False,
                       name='block0')(x, train=train)
        in_ch = self.channels * expansion
        for i in range(1, self.num_blocks):
            last = i == self.num_blocks - 1
            x = self.block(in_ch, self.channels, norm_cfg=self.norm_cfg,
                           act_out=not last, name=f'block{i}')(x, train=train)
        return x


@MODELS.register_module()
class DDRNet(nn.Module):
    in_channels: int = 3
    channels: int = 32
    ppm_channels: int = 128
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

        # stem: 1/8, 2c channels
        h = ConvModule(self.in_channels, c, 3, stride=2, padding=1,
                       norm_cfg=norm_cfg, act_cfg=act_cfg,
                       name='stem_conv1')(x, train=train)
        h = ConvModule(c, c, 3, stride=2, padding=1, norm_cfg=norm_cfg,
                       act_cfg=act_cfg, name='stem_conv2')(h, train=train)
        h = _Stage(BasicBlock, c, c, 2, norm_cfg=norm_cfg,
                   name='stem_layer1')(h, train=train)
        h = nn.relu(h)
        h = _Stage(BasicBlock, c, 2 * c, 2, stride=2, norm_cfg=norm_cfg,
                   name='stem_layer2')(h, train=train)
        stem = nn.relu(h)

        # stage 3
        x_c = _Stage(BasicBlock, 2 * c, 4 * c, 2, stride=2, norm_cfg=norm_cfg,
                     name='context1')(stem, train=train)
        x_s = _Stage(BasicBlock, 2 * c, 2 * c, 2, norm_cfg=norm_cfg,
                     name='spatial1')(stem, train=train)
        comp = ConvModule(4 * c, 2 * c, 1, norm_cfg=norm_cfg, act_cfg=None,
                          name='compression_1')(nn.relu(x_c), train=train)
        x_c = x_c + ConvModule(2 * c, 4 * c, 3, stride=2, padding=1,
                               norm_cfg=norm_cfg, act_cfg=None,
                               name='down_1')(nn.relu(x_s), train=train)
        x_s = x_s + resize_bilinear(comp, out_size, self.align_corners)
        temp_context = x_s

        # stage 4
        x_c = _Stage(BasicBlock, 4 * c, 8 * c, 2, stride=2, norm_cfg=norm_cfg,
                     name='context2')(nn.relu(x_c), train=train)
        x_s = _Stage(BasicBlock, 2 * c, 2 * c, 2, norm_cfg=norm_cfg,
                     name='spatial2')(nn.relu(x_s), train=train)
        comp = ConvModule(8 * c, 2 * c, 1, norm_cfg=norm_cfg, act_cfg=None,
                          name='compression_2')(nn.relu(x_c), train=train)
        down = ConvModule(2 * c, 4 * c, 3, stride=2, padding=1,
                          norm_cfg=norm_cfg, act_cfg=act_cfg,
                          name='down_2a')(nn.relu(x_s), train=train)
        down = ConvModule(4 * c, 8 * c, 3, stride=2, padding=1,
                          norm_cfg=norm_cfg, act_cfg=None,
                          name='down_2b')(down, train=train)
        x_c = x_c + down
        x_s = x_s + resize_bilinear(comp, out_size, self.align_corners)

        # stage 5
        x_s = _Stage(Bottleneck, 2 * c, 2 * c, 1, norm_cfg=norm_cfg,
                     name='spatial3')(nn.relu(x_s), train=train)
        x_c = _Stage(Bottleneck, 8 * c, 8 * c, 1, stride=2, norm_cfg=norm_cfg,
                     name='context3')(nn.relu(x_c), train=train)
        x_c = DAPPM(16 * c, self.ppm_channels, 4 * c, num_scales=5,
                    name='spp')(x_c, train=train)
        x_c = resize_bilinear(x_c, out_size, self.align_corners)

        return temp_context, x_s + x_c
