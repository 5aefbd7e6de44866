"""BiSeNetV1 backbone (spatial path + ResNet context path).

Behavioral spec: reference ``mmseg/models/backbones/bisenetv1.py:11-332``:
SpatialPath = 7x7 s2 + 2x 3x3 s2 + 1x1 convs (to 1/8); ContextPath wraps a
ResNet and refines 1/16 and 1/32 features with ARM modules + a global-pool
context, nearest-upsampled down the pyramid; FeatureFusionModule concatenates
spatial/context features with channel attention. Outputs
``(fused@1/8, context@1/8, context@1/16)`` selected by ``out_indices``.
"""
from __future__ import annotations

from typing import Dict, Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp

from lednet_tpu.models.layers import ConvModule
from lednet_tpu.ops import global_avg_pool
from lednet_tpu.ops.resize import resize_nearest
from lednet_tpu.registry import MODELS


class SpatialPath(nn.Module):
    in_channels: int = 3
    num_channels: Sequence[int] = (64, 64, 64, 128)
    norm_cfg: Optional[Dict] = None
    act_cfg: Optional[Dict] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        norm_cfg = self.norm_cfg or dict(type='BN')
        act_cfg = self.act_cfg or dict(type='ReLU')
        chans = list(self.num_channels)
        x = ConvModule(self.in_channels, chans[0], 7, stride=2, padding=3,
                       norm_cfg=norm_cfg, act_cfg=act_cfg,
                       name='layer1')(x, train=train)
        for i in range(1, len(chans) - 1):
            x = ConvModule(chans[i - 1], chans[i], 3, stride=2, padding=1,
                           norm_cfg=norm_cfg, act_cfg=act_cfg,
                           name=f'layer{i + 1}')(x, train=train)
        return ConvModule(chans[-2], chans[-1], 1, norm_cfg=norm_cfg,
                          act_cfg=act_cfg,
                          name=f'layer{len(chans)}')(x, train=train)


class AttentionRefinementModule(nn.Module):
    in_channels: int
    out_channels: int
    norm_cfg: Optional[Dict] = None
    act_cfg: Optional[Dict] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        norm_cfg = self.norm_cfg or dict(type='BN')
        act_cfg = self.act_cfg or dict(type='ReLU')
        x = ConvModule(self.in_channels, self.out_channels, 3, padding=1,
                       norm_cfg=norm_cfg, act_cfg=act_cfg,
                       name='conv')(x, train=train)
        attn = ConvModule(self.out_channels, self.out_channels, 1, bias=False,
                          norm_cfg=norm_cfg, act_cfg=None,
                          name='atten')(global_avg_pool(x), train=train)
        return x * nn.sigmoid(attn)


class FeatureFusionModule(nn.Module):
    in_channels: int
    out_channels: int
    norm_cfg: Optional[Dict] = None
    act_cfg: Optional[Dict] = None

    @nn.compact
    def __call__(self, x_sp, x_cp, train: bool = False):
        norm_cfg = self.norm_cfg or dict(type='BN')
        act_cfg = self.act_cfg or dict(type='ReLU')
        x = ConvModule(self.in_channels, self.out_channels, 1,
                       norm_cfg=norm_cfg, act_cfg=act_cfg, name='conv1')(
            jnp.concatenate([x_sp, x_cp], axis=-1), train=train)
        attn = ConvModule(self.out_channels, self.out_channels, 1, bias=False,
                          norm_cfg=norm_cfg, act_cfg=act_cfg,
                          name='conv_atten')(global_avg_pool(x), train=train)
        attn = nn.sigmoid(attn)
        return x * attn + x


@MODELS.register_module()
class BiSeNetV1(nn.Module):
    backbone_cfg: Dict
    in_channels: int = 3
    spatial_channels: Sequence[int] = (64, 64, 64, 128)
    context_channels: Sequence[int] = (128, 256, 512)
    out_indices: Sequence[int] = (0, 1, 2)
    align_corners: bool = False
    out_channels: int = 256
    norm_cfg: Optional[Dict] = None
    act_cfg: Optional[Dict] = None
    init_cfg: Optional[Dict] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        cc = list(self.context_channels)
        backbone = MODELS.build(dict(self.backbone_cfg))
        x_4, x_8, x_16, x_32 = backbone(x, train=train)

        x_gap = ConvModule(cc[2], cc[0], 1, norm_cfg=self.norm_cfg or dict(type='BN'),
                           act_cfg=self.act_cfg or dict(type='ReLU'),
                           name='gap_conv')(global_avg_pool(x_32), train=train)
        x_32_arm = AttentionRefinementModule(cc[2], cc[0],
                                             name='arm32')(x_32, train=train)
        x_32_up = resize_nearest(x_32_arm + x_gap, x_16.shape[-3:-1])
        x_32_up = ConvModule(cc[0], cc[0], 3, padding=1,
                             norm_cfg=self.norm_cfg or dict(type='BN'),
                             act_cfg=self.act_cfg or dict(type='ReLU'),
                             name='conv_head32')(x_32_up, train=train)
        x_16_arm = AttentionRefinementModule(cc[1], cc[0],
                                             name='arm16')(x_16, train=train)
        x_16_up = resize_nearest(x_16_arm + x_32_up, x_8.shape[-3:-1])
        x_16_up = ConvModule(cc[0], cc[0], 3, padding=1,
                             norm_cfg=self.norm_cfg or dict(type='BN'),
                             act_cfg=self.act_cfg or dict(type='ReLU'),
                             name='conv_head16')(x_16_up, train=train)

        x_spatial = SpatialPath(self.in_channels, self.spatial_channels,
                                name='spatial_path')(x, train=train)
        x_fuse = FeatureFusionModule(cc[1], self.out_channels,
                                     name='ffm')(x_spatial, x_16_up,
                                                 train=train)
        outs = [x_fuse, x_16_up, x_32_up]
        return tuple(outs[i] for i in self.out_indices)
