"""PSPNet / DeepLab-family decode heads.

Behavioral specs from the reference:
- ``mmseg/models/decode_heads/psp_head.py``: PPM — adaptive-avg-pool at
  scales (1,2,3,6) + 1x1 conv + bilinear upsample, concat with the input,
  3x3 bottleneck, cls_seg.
- ``mmseg/models/decode_heads/aspp_head.py``: ASPP — 1x1 conv + three 3x3
  convs at dilations (12,24,36) + global-pool branch, concat, 3x3
  bottleneck, cls_seg.
- ``mmseg/models/decode_heads/sep_aspp_head.py`` (DeepLabV3+): ASPP with
  depthwise-separable 3x3s, a 1x1-projected low-level ``c1`` skip at 1/4 and
  two separable 3x3 fusion convs.
"""
from __future__ import annotations

from typing import Dict, Optional, Sequence, Union

import flax.linen as nn
import jax.numpy as jnp

from lednet_tpu.models.decode_heads.base import (ClsSeg, build_losses,
                                                 default_loss_by_feat,
                                                 resolve_out_channels,
                                                 select_inputs)
from lednet_tpu.models.layers import ConvModule
from lednet_tpu.ops import adaptive_avg_pool2d, global_avg_pool
from lednet_tpu.ops.resize import resize_bilinear
from lednet_tpu.registry import MODELS


class _SepConv(nn.Module):
    """DepthwiseSeparableConvModule: dw 3x3 + pw 1x1, norm+act on both."""
    in_channels: int
    out_channels: int
    kernel_size: int = 3
    dilation: int = 1
    norm_cfg: Optional[Dict] = None
    act_cfg: Optional[Dict] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        pad = (self.kernel_size // 2) * self.dilation
        x = ConvModule(self.in_channels, self.in_channels, self.kernel_size,
                       padding=pad, dilation=self.dilation,
                       groups=self.in_channels,
                       norm_cfg=self.norm_cfg or dict(type='BN'),
                       act_cfg=self.act_cfg or dict(type='ReLU'),
                       name='dw')(x, train=train)
        return ConvModule(self.in_channels, self.out_channels, 1,
                          norm_cfg=self.norm_cfg or dict(type='BN'),
                          act_cfg=self.act_cfg or dict(type='ReLU'),
                          name='pw')(x, train=train)


class _HeadBase(nn.Module):
    """Shared config surface for the single-logit heads below."""
    in_channels: Union[int, Sequence[int]]
    channels: int
    num_classes: int
    dropout_ratio: float = 0.1
    norm_cfg: Optional[Dict] = None
    act_cfg: Optional[Dict] = None
    align_corners: bool = False
    ignore_index: int = 255
    in_index: Union[int, Sequence[int]] = -1
    input_transform: Optional[str] = None
    out_channels: Optional[int] = None
    threshold: Optional[float] = None
    loss_decode: Optional[Dict] = None
    sampler: Optional[Dict] = None
    init_cfg: Optional[Dict] = None

    @property
    def num_out_channels(self) -> int:
        return resolve_out_channels(self.num_classes, self.out_channels,
                                    self.threshold)[0]

    def loss_by_feat(self, seg_logits, seg_label) -> Dict:
        return default_loss_by_feat(seg_logits, seg_label,
                                    build_losses(self.loss_decode),
                                    self.align_corners, self.ignore_index,
                                    sampler=self.sampler)

    def predict_by_feat(self, seg_logits, size=None):
        if size is None:
            return seg_logits
        return resize_bilinear(seg_logits, size, self.align_corners)


@MODELS.register_module()
class PSPHead(_HeadBase):
    pool_scales: Sequence[int] = (1, 2, 3, 6)

    @nn.compact
    def __call__(self, inputs, train: bool = False, with_aux: bool = True):
        norm_cfg = self.norm_cfg or dict(type='BN')
        act_cfg = self.act_cfg or dict(type='ReLU')
        x = select_inputs(inputs, self.in_index, self.input_transform,
                          self.align_corners)
        size = x.shape[-3:-1]
        feats = [x]
        for scale in self.pool_scales:
            p = adaptive_avg_pool2d(x, scale)
            p = ConvModule(x.shape[-1], self.channels, 1, norm_cfg=norm_cfg,
                           act_cfg=act_cfg,
                           name=f'ppm{scale}')(p, train=train)
            feats.append(resize_bilinear(p, size, self.align_corners))
        out = ConvModule(x.shape[-1] + len(self.pool_scales) * self.channels,
                         self.channels, 3, padding=1, norm_cfg=norm_cfg,
                         act_cfg=act_cfg, name='bottleneck')(
            jnp.concatenate(feats, axis=-1), train=train)
        return ClsSeg(self.channels, self.num_out_channels,
                      self.dropout_ratio, name='cls')(out, train=train)


@MODELS.register_module()
class ASPPHead(_HeadBase):
    dilations: Sequence[int] = (1, 12, 24, 36)
    separable: bool = False
    c1_in_channels: int = 0
    c1_channels: int = 0

    @nn.compact
    def __call__(self, inputs, train: bool = False, with_aux: bool = True):
        norm_cfg = self.norm_cfg or dict(type='BN')
        act_cfg = self.act_cfg or dict(type='ReLU')
        x = select_inputs(inputs, self.in_index, self.input_transform,
                          self.align_corners)
        size = x.shape[-3:-1]
        in_ch = x.shape[-1]

        img_pool = ConvModule(in_ch, self.channels, 1, norm_cfg=norm_cfg,
                              act_cfg=act_cfg,
                              name='image_pool')(global_avg_pool(x),
                                                 train=train)
        feats = [resize_bilinear(img_pool, size, self.align_corners)]
        for i, d in enumerate(self.dilations):
            if d == 1:
                feats.append(ConvModule(in_ch, self.channels, 1,
                                        norm_cfg=norm_cfg, act_cfg=act_cfg,
                                        name=f'aspp{i}')(x, train=train))
            elif self.separable:
                feats.append(_SepConv(in_ch, self.channels, 3, dilation=d,
                                      norm_cfg=norm_cfg, act_cfg=act_cfg,
                                      name=f'aspp{i}')(x, train=train))
            else:
                feats.append(ConvModule(in_ch, self.channels, 3, padding=d,
                                        dilation=d, norm_cfg=norm_cfg,
                                        act_cfg=act_cfg,
                                        name=f'aspp{i}')(x, train=train))
        out = ConvModule(self.channels * (len(self.dilations) + 1),
                         self.channels, 3, padding=1, norm_cfg=norm_cfg,
                         act_cfg=act_cfg, name='bottleneck')(
            jnp.concatenate(feats, axis=-1), train=train)

        if self.c1_in_channels > 0 and isinstance(inputs, (list, tuple)):
            c1 = ConvModule(self.c1_in_channels, self.c1_channels, 1,
                            norm_cfg=norm_cfg, act_cfg=act_cfg,
                            name='c1_bottleneck')(inputs[0], train=train)
            out = resize_bilinear(out, c1.shape[-3:-1], self.align_corners)
            out = jnp.concatenate([out, c1], axis=-1)
            out = _SepConv(self.channels + self.c1_channels, self.channels, 3,
                           norm_cfg=norm_cfg, act_cfg=act_cfg,
                           name='sep1')(out, train=train)
            out = _SepConv(self.channels, self.channels, 3, norm_cfg=norm_cfg,
                           act_cfg=act_cfg, name='sep2')(out, train=train)
        return ClsSeg(self.channels, self.num_out_channels,
                      self.dropout_ratio, name='cls')(out, train=train)


@MODELS.register_module()
class DepthwiseSeparableASPPHead(ASPPHead):
    """DeepLabV3+ head (separable ASPP + c1 skip)."""
    separable: bool = True
    c1_in_channels: int = 256
    c1_channels: int = 48


@MODELS.register_module()
class SegformerHead(_HeadBase):
    """SegFormer's all-MLP head (reference
    ``mmseg/models/decode_heads/segformer_head.py``): 1x1 conv per level,
    upsample all to the finest, concat, 1x1 fuse, cls_seg."""
    interpolate_mode: str = 'bilinear'
    in_index: Sequence[int] = (0, 1, 2, 3)
    input_transform: Optional[str] = 'multiple_select'

    @nn.compact
    def __call__(self, inputs, train: bool = False, with_aux: bool = True):
        norm_cfg = self.norm_cfg or dict(type='BN')
        act_cfg = self.act_cfg or dict(type='ReLU')
        xs = select_inputs(inputs, self.in_index, 'multiple_select',
                           self.align_corners)
        size = xs[0].shape[-3:-1]
        outs = []
        for i, x in enumerate(xs):
            h = ConvModule(x.shape[-1], self.channels, 1, norm_cfg=norm_cfg,
                           act_cfg=act_cfg, name=f'conv{i}')(x, train=train)
            outs.append(resize_bilinear(h, size, self.align_corners))
        fused = ConvModule(self.channels * len(outs), self.channels, 1,
                           norm_cfg=norm_cfg, act_cfg=act_cfg,
                           name='fusion_conv')(
            jnp.concatenate(outs, axis=-1), train=train)
        return ClsSeg(self.channels, self.num_out_channels,
                      self.dropout_ratio, name='cls')(fused, train=train)
