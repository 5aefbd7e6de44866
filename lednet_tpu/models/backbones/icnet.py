"""ICNet backbone.

Behavioral spec: reference ``mmseg/models/backbones/icnet.py:12-166`` — a
cascade image network: sub1 = three s2 convs on the full image (1/8);
sub2 = the wrapped backbone's stem+stage1/2 on a 1/2-downsampled image,
projected by ``conv_sub2``; sub4 = the backbone's stage3/4 RE-ENTERED on a
further 1/2 downsample of the sub2 feature, PSP-pooled (per-scale 1x1
convs, reference PPM), 3x3 bottleneck, projected by ``conv_sub4``. The
wrapped backbone's stem maxpool runs in ceil mode (reference ``:72-74``).
Returns (sub1, sub2, sub4) for the ICNeck.
"""
from __future__ import annotations

from typing import Dict, Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp

from lednet_tpu.models.layers import ConvModule
from lednet_tpu.ops import adaptive_avg_pool2d
from lednet_tpu.ops.resize import resize_bilinear
from lednet_tpu.registry import MODELS


@MODELS.register_module()
class ICNet(nn.Module):
    backbone_cfg: Dict
    in_channels: int = 3
    layer_channels: Sequence[int] = (512, 2048)
    light_branch_middle_channels: int = 32
    psp_out_channels: int = 512
    out_channels: Sequence[int] = (64, 256, 256)
    pool_scales: Sequence[int] = (1, 2, 3, 6)
    align_corners: bool = False
    norm_cfg: Optional[Dict] = None
    act_cfg: Optional[Dict] = None
    init_cfg: Optional[Dict] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        norm_cfg = self.norm_cfg or dict(type='BN')
        act_cfg = self.act_cfg or dict(type='ReLU')
        mid = self.light_branch_middle_channels

        # sub1: light branch on the full image -> 1/8 (reference conv_sub1)
        h = ConvModule(self.in_channels, mid, 3, stride=2, padding=1,
                       norm_cfg=norm_cfg, act_cfg=act_cfg,
                       name='sub1_conv1')(x, train=train)
        h = ConvModule(mid, mid, 3, stride=2, padding=1, norm_cfg=norm_cfg,
                       act_cfg=act_cfg, name='sub1_conv2')(h, train=train)
        sub1 = ConvModule(mid, self.out_channels[0], 3, stride=2, padding=1,
                          norm_cfg=norm_cfg, act_cfg=act_cfg,
                          name='sub1_conv3')(h, train=train)

        # sub2: stem + stages 1-2 of the wrapped backbone on a 1/2 input.
        # The faithful re-entry surface (stage_range, ceil-mode stem pool)
        # exists on the ResNet family, which is the only backbone the
        # reference's attribute access (.layer3/.layer4) supports either;
        # other backbones fall back to two full generic passes.
        bb_cfg = dict(self.backbone_cfg)
        is_resnet = 'ResNet' in str(bb_cfg.get('type', ''))
        if is_resnet:
            bb_cfg.setdefault('ceil_maxpool', True)
        backbone = MODELS.build(bb_cfg)
        # torch semantics: the reference resizes by scale_factor=0.5
        # (coordinate mapping by the factor, not the size ratio)
        half = resize_bilinear(x, align_corners=self.align_corners,
                               scale_factor=0.5)
        if is_resnet:
            mid_feat = backbone(half, train=train, stage_range=(0, 2))[-1]
        else:
            mid_feat = backbone(half, train=train)[1]
        sub2 = ConvModule(mid_feat.shape[-1], self.out_channels[1], 1,
                          norm_cfg=norm_cfg, act_cfg=act_cfg,
                          name='conv_sub2')(mid_feat, train=train)

        # sub4: re-enter stages 3-4 on the pooled mid feature, then PSP
        quarter = resize_bilinear(mid_feat, align_corners=self.align_corners,
                                  scale_factor=0.5)
        if is_resnet:
            deep = backbone(quarter, train=train, stage_range=(2, 4))[-1]
        else:
            half_half = resize_bilinear(half, align_corners=self.align_corners,
                                        scale_factor=0.5)
            deep = backbone(half_half, train=train)[-1]
        size = deep.shape[-3:-1]
        psp_outs = []
        for si, s in enumerate(self.pool_scales):
            p = adaptive_avg_pool2d(deep, s)
            p = ConvModule(deep.shape[-1], self.psp_out_channels, 1,
                           norm_cfg=norm_cfg, act_cfg=act_cfg,
                           name=f'ppm{si}')(p, train=train)
            psp_outs.append(resize_bilinear(p, size, self.align_corners))
        psp = jnp.concatenate(psp_outs + [deep], axis=-1)
        psp = ConvModule(psp.shape[-1], self.psp_out_channels, 3, padding=1,
                         norm_cfg=norm_cfg, act_cfg=act_cfg,
                         name='psp_bottleneck')(psp, train=train)
        sub4 = ConvModule(self.psp_out_channels, self.out_channels[2], 1,
                          norm_cfg=norm_cfg, act_cfg=act_cfg,
                          name='conv_sub4')(psp, train=train)

        return sub1, sub2, sub4
