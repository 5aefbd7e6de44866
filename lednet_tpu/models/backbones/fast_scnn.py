"""Fast-SCNN backbone.

Behavioral spec: reference ``mmseg/models/backbones/fast_scnn.py`` — three
parts: Learning-To-Downsample (conv s2 + two separable convs s2 -> 1/8),
GlobalFeatureExtractor (three MobileNetV2 inverted-residual stages at 1/16,
1/32 + PPM), FeatureFusionModule (upsample low-res x4, dw conv + add fusion).
Returns (higher_res@1/8, lower_res@1/32, fusion@1/8).
"""
from __future__ import annotations

from typing import Dict, Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp

from lednet_tpu.models.layers import ConvModule
from lednet_tpu.ops import adaptive_avg_pool2d
from lednet_tpu.ops.resize import resize_bilinear
from lednet_tpu.registry import MODELS


class InvertedResidual(nn.Module):
    """MobileNetV2 bottleneck (``mmseg/models/utils/inverted_residual.py``).

    Fast-SCNN passes ``act_cfg=ReLU`` down to these blocks
    (``fast_scnn.py:165-182``), so the activation is configurable here
    rather than the MobileNetV2 default ReLU6.
    """
    in_channels: int
    out_channels: int
    stride: int = 1
    expand_ratio: int = 6
    norm_cfg: Optional[Dict] = None
    act_cfg: Optional[Dict] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        norm_cfg = self.norm_cfg or dict(type='BN')
        act = self.act_cfg or dict(type='ReLU6')
        mid = self.in_channels * self.expand_ratio
        h = x
        if self.expand_ratio != 1:
            h = ConvModule(self.in_channels, mid, 1, norm_cfg=norm_cfg,
                           act_cfg=act, name='expand')(h, train=train)
        h = ConvModule(mid, mid, 3, stride=self.stride, padding=1, groups=mid,
                       norm_cfg=norm_cfg, act_cfg=act, name='dw')(h, train=train)
        h = ConvModule(mid, self.out_channels, 1, norm_cfg=norm_cfg,
                       act_cfg=None, name='project')(h, train=train)
        if self.stride == 1 and self.in_channels == self.out_channels:
            return x + h
        return h


class _PPM(nn.Module):
    in_channels: int
    channels: int
    pool_scales: Sequence[int] = (1, 2, 3, 6)
    align_corners: bool = False
    norm_cfg: Optional[Dict] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        norm_cfg = self.norm_cfg or dict(type='BN')
        size = x.shape[-3:-1]
        feats = [x]
        for s in self.pool_scales:
            p = ConvModule(self.in_channels, self.channels, 1,
                           norm_cfg=norm_cfg, act_cfg=dict(type='ReLU'),
                           name=f'pool{s}')(adaptive_avg_pool2d(x, s),
                                            train=train)
            feats.append(resize_bilinear(p, size, self.align_corners))
        return jnp.concatenate(feats, axis=-1)


@MODELS.register_module()
class FastSCNN(nn.Module):
    in_channels: int = 3
    downsample_dw_channels: Sequence[int] = (32, 48)
    global_in_channels: int = 64
    global_block_channels: Sequence[int] = (64, 96, 128)
    global_block_strides: Sequence[int] = (2, 2, 1)
    global_out_channels: int = 128
    higher_in_channels: int = 64
    lower_in_channels: int = 128
    fusion_out_channels: int = 128
    out_indices: Sequence[int] = (0, 1, 2)
    align_corners: bool = False
    norm_cfg: Optional[Dict] = None
    act_cfg: Optional[Dict] = None
    dw_act_cfg: Optional[Dict] = None
    init_cfg: Optional[Dict] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        norm_cfg = self.norm_cfg or dict(type='BN')
        act = self.act_cfg or dict(type='ReLU')
        d1, d2 = self.downsample_dw_channels

        # learning to downsample -> 1/8
        h = ConvModule(self.in_channels, d1, 3, stride=2, padding=1,
                       norm_cfg=norm_cfg, act_cfg=act, name='ltd_conv')(x, train=train)
        h = _StridedSep(d1, d2, norm_cfg, dw_act_cfg=self.dw_act_cfg,
                        pw_act_cfg=act, name='ltd_sep1')(h, train=train)
        higher = _StridedSep(d2, self.global_in_channels, norm_cfg,
                             dw_act_cfg=self.dw_act_cfg, pw_act_cfg=act,
                             name='ltd_sep2')(h, train=train)

        # global feature extractor
        g = higher
        in_ch = self.global_in_channels
        for i, (ch, stride) in enumerate(zip(self.global_block_channels,
                                             self.global_block_strides)):
            for j in range(3):
                g = InvertedResidual(in_ch, ch, stride if j == 0 else 1,
                                     norm_cfg=norm_cfg, act_cfg=act,
                                     name=f'gfe{i}_{j}')(g, train=train)
                in_ch = ch
        g = _PPM(in_ch, in_ch // 4, align_corners=self.align_corners,
                 norm_cfg=norm_cfg, name='ppm')(g, train=train)
        lower = ConvModule(in_ch * 2, self.global_out_channels, 3, padding=1,
                           norm_cfg=norm_cfg, act_cfg=act,
                           name='gfe_out')(g, train=train)

        # feature fusion
        low_up = resize_bilinear(lower, higher.shape[-3:-1],
                                 self.align_corners)
        low_up = ConvModule(self.global_out_channels, self.global_out_channels,
                            3, padding=1, groups=self.global_out_channels,
                            norm_cfg=norm_cfg, act_cfg=act,
                            name='ffm_dw')(low_up, train=train)
        low_up = ConvModule(self.global_out_channels, self.fusion_out_channels,
                            1, norm_cfg=norm_cfg, act_cfg=None,
                            name='ffm_low')(low_up, train=train)
        high_p = ConvModule(self.higher_in_channels, self.fusion_out_channels,
                            1, norm_cfg=norm_cfg, act_cfg=None,
                            name='ffm_high')(higher, train=train)
        fusion = nn.relu(low_up + high_p)

        outs = [higher, lower, fusion]
        return tuple(outs[i] for i in self.out_indices)


class _StridedSep(nn.Module):
    """stride-2 depthwise-separable conv used by the LTD module.

    The reference builds these with ``dw_act_cfg=None`` by default
    (``fast_scnn.py:38,57-73``): BN but NO activation after the depthwise
    conv, ReLU (``act_cfg``) after the pointwise conv.
    """
    in_channels: int
    out_channels: int
    norm_cfg: Optional[Dict] = None
    dw_act_cfg: Optional[Dict] = None
    pw_act_cfg: Optional[Dict] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        norm_cfg = self.norm_cfg or dict(type='BN')
        x = ConvModule(self.in_channels, self.in_channels, 3, stride=2,
                       padding=1, groups=self.in_channels, norm_cfg=norm_cfg,
                       act_cfg=self.dw_act_cfg, name='dw')(x, train=train)
        return ConvModule(self.in_channels, self.out_channels, 1,
                          norm_cfg=norm_cfg,
                          act_cfg=self.pw_act_cfg or dict(type='ReLU'),
                          name='pw')(x, train=train)
