"""STDC backbone family (Short-Term Dense Concatenate).

Behavioral spec: reference ``mmseg/models/backbones/stdc.py:16-426``:

- STDCModule: 1x1 conv to out/2 then a chain of 3x3 convs halving channels
  (out/4, out/8, out/8 for num_convs=4); 'cat' fusion concatenates all taps
  (stride-2: first tap is avg-pooled, the second conv eats the depthwise-
  downsampled first); 'add' fusion adds a skip projection,
- STDCNet: two 3x3 s2 stem convs + three STDC stages (strides per arch);
  returns the deep three stages (1/8, 1/16, 1/32),
- STDCContextPathNet: BiSeNet-style context path over the STDCNet (ARM
  modules + global context, nearest upsampling) + an FFM with a two-conv
  attention; outputs ``(feat@1/8 for STDCHead, arm16, arm8, fused)``.
"""
from __future__ import annotations

from typing import Dict, Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp

from lednet_tpu.models.backbones.bisenetv1 import AttentionRefinementModule
from lednet_tpu.models.layers import ConvModule
from lednet_tpu.ops import avg_pool2d, global_avg_pool
from lednet_tpu.ops.resize import resize
from lednet_tpu.registry import MODELS


class STDCModule(nn.Module):
    in_channels: int
    out_channels: int
    stride: int
    norm_cfg: Optional[Dict] = None
    act_cfg: Optional[Dict] = None
    num_convs: int = 4
    fusion_type: str = 'add'

    @nn.compact
    def __call__(self, x, train: bool = False):
        norm_cfg = self.norm_cfg or dict(type='BN')
        act_cfg = self.act_cfg or dict(type='ReLU')
        down = self.stride == 2
        oc = self.out_channels

        # conv_0 does not forward act_cfg upstream (``stdc.py:48-49``) —
        # it keeps mmcv ConvModule's default ReLU whatever act_cfg says.
        conv0 = ConvModule(self.in_channels, oc // 2, 1, norm_cfg=norm_cfg,
                           act_cfg=dict(type='ReLU'), name='conv0')
        mid_convs = []
        for i in range(1, self.num_convs):
            out_factor = 2 ** (i + 1) if i != self.num_convs - 1 else 2 ** i
            mid_convs.append(
                ConvModule(oc // 2 ** i, oc // out_factor, 3, padding=1,
                           norm_cfg=norm_cfg, act_cfg=act_cfg,
                           name=f'conv{i}'))

        if self.fusion_type == 'cat':
            x0 = conv0(x, train=train)
            taps = [x0]
            h = x0
            for i, conv in enumerate(mid_convs):
                if i == 0 and down:
                    h = ConvModule(oc // 2, oc // 2, 3, stride=2, padding=1,
                                   groups=oc // 2, norm_cfg=norm_cfg,
                                   act_cfg=None, name='downsample')(h, train=train)
                h = conv(h, train=train)
                taps.append(h)
            if down:
                taps[0] = avg_pool2d(x0, 3, 2, 1)
            return jnp.concatenate(taps, axis=-1)

        # 'add' fusion
        taps = []
        h = conv0(x, train=train)
        if down:
            h = ConvModule(oc // 2, oc // 2, 3, stride=2, padding=1,
                           groups=oc // 2, norm_cfg=norm_cfg, act_cfg=None,
                           name='downsample')(h, train=train)
        taps.append(h)
        for conv in mid_convs:
            h = conv(h, train=train)
            taps.append(h)
        skip = x
        if down:
            skip = ConvModule(self.in_channels, self.in_channels, 3, stride=2,
                              padding=1, groups=self.in_channels,
                              norm_cfg=norm_cfg, act_cfg=None,
                              name='skip_dw')(skip, train=train)
            skip = ConvModule(self.in_channels, oc, 1, norm_cfg=norm_cfg,
                              act_cfg=None, name='skip_pw')(skip, train=train)
        return jnp.concatenate(taps, axis=-1) + skip


@MODELS.register_module()
class STDCNet(nn.Module):
    stdc_type: str = 'STDCNet1'
    in_channels: int = 3
    channels: Sequence[int] = (32, 64, 256, 512, 1024)
    bottleneck_type: str = 'cat'
    norm_cfg: Optional[Dict] = None
    act_cfg: Optional[Dict] = None
    num_convs: int = 4
    with_final_conv: bool = False
    pretrained: Optional[str] = None
    init_cfg: Optional[Dict] = None

    arch_settings = {
        'STDCNet1': [(2, 1), (2, 1), (2, 1)],
        'STDCNet2': [(2, 1, 1, 1), (2, 1, 1, 1, 1), (2, 1, 1)],
    }

    @nn.compact
    def __call__(self, x, train: bool = False):
        norm_cfg = self.norm_cfg or dict(type='BN')
        act_cfg = self.act_cfg or dict(type='ReLU')
        ch = list(self.channels)
        x = ConvModule(self.in_channels, ch[0], 3, stride=2, padding=1,
                       norm_cfg=norm_cfg, act_cfg=act_cfg,
                       name='stage0')(x, train=train)
        x = ConvModule(ch[0], ch[1], 3, stride=2, padding=1, norm_cfg=norm_cfg,
                       act_cfg=act_cfg, name='stage1')(x, train=train)
        outs = []
        for s, strides in enumerate(self.arch_settings[self.stdc_type]):
            in_ch = ch[s + 1]
            for j, stride in enumerate(strides):
                x = STDCModule(in_ch if j == 0 else ch[s + 2], ch[s + 2],
                               stride, norm_cfg, act_cfg,
                               num_convs=self.num_convs,
                               fusion_type=self.bottleneck_type,
                               name=f'stage{s + 2}_{j}')(x, train=train)
            outs.append(x)
        if self.with_final_conv:
            outs[-1] = ConvModule(ch[-1], max(1024, ch[-1]), 1,
                                  norm_cfg=norm_cfg, act_cfg=act_cfg,
                                  name='final_conv')(outs[-1], train=train)
        return tuple(outs)


class _STDCFusion(nn.Module):
    """STDC's FFM: two-conv bottleneck attention (reference ``stdc.py:133``)."""
    in_channels: int
    out_channels: int
    scale_factor: int = 4
    norm_cfg: Optional[Dict] = None
    act_cfg: Optional[Dict] = None

    @nn.compact
    def __call__(self, spatial, context, train: bool = False):
        norm_cfg = self.norm_cfg or dict(type='BN')
        act_cfg = self.act_cfg or dict(type='ReLU')
        hidden = self.out_channels // self.scale_factor
        x = ConvModule(self.in_channels, self.out_channels, 1,
                       norm_cfg=norm_cfg, act_cfg=act_cfg, name='conv0')(
            jnp.concatenate([spatial, context], axis=-1), train=train)
        a = ConvModule(self.out_channels, hidden, 1, bias=False, norm_cfg=None,
                       act_cfg=act_cfg, name='attn1')(global_avg_pool(x),
                                                      train=train)
        a = ConvModule(hidden, self.out_channels, 1, bias=False, norm_cfg=None,
                       act_cfg=None, name='attn2')(a, train=train)
        attn = nn.sigmoid(a)
        return x * attn + x


@MODELS.register_module()
class STDCContextPathNet(nn.Module):
    backbone_cfg: Dict
    last_in_channels: Sequence[int] = (1024, 512)
    out_channels: int = 128
    ffm_cfg: Optional[Dict] = None
    upsample_mode: str = 'nearest'
    align_corners: Optional[bool] = None
    norm_cfg: Optional[Dict] = None
    init_cfg: Optional[Dict] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        norm_cfg = self.norm_cfg or dict(type='BN')
        outs = list(MODELS.build(dict(self.backbone_cfg))(x, train=train))
        # conv_avg / the ARM-following convs rely on mmcv ConvModule's
        # default act_cfg=ReLU (``stdc.py:384-396``).
        avg_feat = ConvModule(self.last_in_channels[0], self.out_channels, 1,
                              norm_cfg=norm_cfg, act_cfg=dict(type='ReLU'),
                              name='conv_avg')(global_avg_pool(outs[-1]),
                                               train=train)
        feature_up = resize(avg_feat, outs[-1].shape[-3:-1],
                            mode=self.upsample_mode,
                            align_corners=bool(self.align_corners))
        arms_out = []
        for i, channels in enumerate(self.last_in_channels):
            x_arm = AttentionRefinementModule(
                channels, self.out_channels,
                name=f'arm{i}')(outs[len(outs) - 1 - i], train=train)
            x_arm = x_arm + feature_up
            feature_up = resize(x_arm, outs[len(outs) - 1 - i - 1].shape[-3:-1],
                                mode=self.upsample_mode,
                                align_corners=bool(self.align_corners))
            feature_up = ConvModule(self.out_channels, self.out_channels, 3,
                                    padding=1, norm_cfg=norm_cfg,
                                    act_cfg=dict(type='ReLU'),
                                    name=f'conv{i}')(feature_up, train=train)
            arms_out.append(feature_up)

        ffm_cfg = dict(self.ffm_cfg or dict(in_channels=512, out_channels=256,
                                            scale_factor=4))
        feat_fuse = _STDCFusion(norm_cfg=norm_cfg, name='ffm',
                                **ffm_cfg)(outs[0], arms_out[1], train=train)
        return tuple([outs[0]] + arms_out + [feat_fuse])
