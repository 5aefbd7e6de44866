"""ERFNet backbone.

Behavioral spec: reference ``mmseg/models/backbones/erfnet.py`` — an
encoder-decoder of DownsamplerBlocks (parallel 3x3-s2 conv + maxpool concat)
and Non-bottleneck-1D blocks (factorized 3x1/1x3 conv pairs, the second pair
dilated), then two deconv upsampling stages with more 1D blocks. Returns the
decoder feature at 1/2 resolution.
"""
from __future__ import annotations

from typing import Dict, Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp

from lednet_tpu.models.layers import ConvModule, Norm2d, kaiming_init
from lednet_tpu.ops import max_pool2d
from lednet_tpu.ops.resize import resize_bilinear
from lednet_tpu.registry import MODELS

# the reference blocks ignore the class-level norm_cfg and always build
# their own BN with eps=1e-3 (erfnet.py:35,96,160)
_BN3 = dict(type='BN', eps=1e-3)


class DownsamplerBlock(nn.Module):
    in_channels: int
    out_channels: int
    norm_cfg: Optional[Dict] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        conv = nn.Conv(self.out_channels - self.in_channels, (3, 3),
                       strides=(2, 2), padding=((1, 1), (1, 1)),
                       kernel_init=kaiming_init, name='conv')(x)
        pool = max_pool2d(x, 2, 2, 0)
        if pool.shape[1:3] != conv.shape[1:3]:
            # odd inputs: conv gives ceil(H/2), pool floor(H/2); the
            # reference bilinearly resizes the pooled branch (erfnet.py:56-61)
            pool = resize_bilinear(pool, conv.shape[1:3], align_corners=False)
        out = jnp.concatenate([conv, pool], axis=-1)
        out = Norm2d(self.norm_cfg or _BN3, name='bn')(out, train=train)
        return nn.relu(out)


class NonBottleneck1d(nn.Module):
    channels: int
    dilation: int = 1
    dropout: float = 0.0
    norm_cfg: Optional[Dict] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        c, d = self.channels, self.dilation
        norm_cfg = self.norm_cfg or _BN3
        h = nn.Conv(c, (3, 1), padding=((1, 1), (0, 0)), use_bias=True,
                    kernel_init=kaiming_init, name='conv3x1_1')(x)
        h = nn.relu(h)
        h = nn.Conv(c, (1, 3), padding=((0, 0), (1, 1)), use_bias=True,
                    kernel_init=kaiming_init, name='conv1x3_1')(h)
        h = Norm2d(norm_cfg, name='bn1')(h, train=train)
        h = nn.relu(h)
        h = nn.Conv(c, (3, 1), padding=((d, d), (0, 0)),
                    kernel_dilation=(d, 1), use_bias=True,
                    kernel_init=kaiming_init, name='conv3x1_2')(h)
        h = nn.relu(h)
        h = nn.Conv(c, (1, 3), padding=((0, 0), (d, d)),
                    kernel_dilation=(1, d), use_bias=True,
                    kernel_init=kaiming_init, name='conv1x3_2')(h)
        h = Norm2d(norm_cfg, name='bn2')(h, train=train)
        if self.dropout > 0:
            h = nn.Dropout(self.dropout, deterministic=not train)(h)
        return nn.relu(x + h)


class UpsamplerBlock(nn.Module):
    in_channels: int
    out_channels: int
    norm_cfg: Optional[Dict] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        # torch ConvTranspose2d(3, s=2, p=1, output_padding=1): 'SAME' gives
        # the right shape but is shifted one pixel — ((1,2),(1,2)) is the
        # exact geometry (torch crops the full deconv at offset 1, flax at
        # offset 0; verified bit-exact in tests/test_erfnet_cgnet_parity.py)
        x = nn.ConvTranspose(self.out_channels, (3, 3), strides=(2, 2),
                             padding=((1, 2), (1, 2)),
                             kernel_init=kaiming_init, name='deconv')(x)
        x = Norm2d(self.norm_cfg or _BN3, name='bn')(x, train=train)
        return nn.relu(x)


@MODELS.register_module()
class ERFNet(nn.Module):
    in_channels: int = 3
    enc_downsample_channels: Sequence[int] = (16, 64, 128)
    enc_stage_non_bottlenecks: Sequence[int] = (5, 8)
    enc_non_bottleneck_dilations: Sequence[int] = (2, 4, 8, 16)
    enc_non_bottleneck_channels: Sequence[int] = (64, 128)
    dec_upsample_channels: Sequence[int] = (64, 16)
    dec_stages_non_bottleneck: Sequence[int] = (2, 2)
    dec_non_bottleneck_channels: Sequence[int] = (64, 16)
    dropout_ratio: float = 0.1
    norm_cfg: Optional[Dict] = None
    act_cfg: Optional[Dict] = None
    init_cfg: Optional[Dict] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        # reference ERFNet never forwards its norm_cfg into the blocks;
        # they keep their own BN(eps=1e-3) defaults (erfnet.py:287-321)
        norm_cfg = None
        dch = list(self.enc_downsample_channels)

        x = DownsamplerBlock(self.in_channels, dch[0], norm_cfg,
                             name='down0')(x, train=train)
        x = DownsamplerBlock(dch[0], dch[1], norm_cfg,
                             name='down1')(x, train=train)
        for i in range(self.enc_stage_non_bottlenecks[0]):
            x = NonBottleneck1d(dch[1], 1, self.dropout_ratio, norm_cfg,
                                name=f'enc1_{i}')(x, train=train)
        x = DownsamplerBlock(dch[1], dch[2], norm_cfg,
                             name='down2')(x, train=train)
        # reference groups the dilated blocks: iteration_times =
        # n2 // len(dilations) full cycles (erfnet.py:296-303) — a
        # non-divisible n2 silently builds fewer blocks, as upstream does
        dils = list(self.enc_non_bottleneck_dilations)
        n2 = (self.enc_stage_non_bottlenecks[1] // len(dils)) * len(dils)
        for i in range(n2):
            x = NonBottleneck1d(dch[2], dils[i % len(dils)],
                                self.dropout_ratio, norm_cfg,
                                name=f'enc2_{i}')(x, train=train)

        # decoder: the reference wires channel counts from
        # dec_non_bottleneck_channels only; dec_upsample_channels
        # contributes just the stage count (erfnet.py:310-321)
        dec_ch = list(self.dec_non_bottleneck_channels)
        in_ch = dch[2]
        for s in range(len(self.dec_upsample_channels)):
            ch = dec_ch[s]
            x = UpsamplerBlock(in_ch, ch, norm_cfg,
                               name=f'up{s}')(x, train=train)
            for i in range(self.dec_stages_non_bottleneck[s]):
                x = NonBottleneck1d(ch, 1, 0.0, norm_cfg,
                                    name=f'dec{s}_{i}')(x, train=train)
            in_ch = ch
        return (x,)
