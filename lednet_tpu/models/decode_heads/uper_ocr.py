"""UPerHead, OCRHead, plus the compact utility heads
(DepthwiseSeparableFCNHead, LRASPPHead, NonLocal/DNL-style context heads).

Behavioral specs:
- ``mmseg/models/decode_heads/uper_head.py``: PSP on the deepest level, FPN
  laterals + top-down fusion, multi-scale concat -> 3x3 bottleneck -> cls.
- ``mmseg/models/decode_heads/ocr_head.py`` (cascade): soft object regions
  from the previous logits, object-context attention between pixels and
  region descriptors, concat + project.
- ``sep_fcn_head.py``: FCN with depthwise-separable convs (Fast-SCNN head).
- ``lraspp_head.py``: MobileNetV3 Lite-RASPP.
- ``nl_head.py``/``dnl_head.py``: non-local context block over the deepest
  feature before an FCN tail.
"""
from __future__ import annotations

from typing import Dict, Optional, Sequence, Union

import flax.linen as nn
import jax
import jax.numpy as jnp

from lednet_tpu.models.decode_heads.base import ClsSeg, select_inputs
from lednet_tpu.models.decode_heads.fcn_head import FCNHead
from lednet_tpu.models.decode_heads.psp_aspp import _HeadBase, _SepConv
from lednet_tpu.models.layers import ConvModule
from lednet_tpu.ops import adaptive_avg_pool2d, avg_pool2d, global_avg_pool
from lednet_tpu.ops.resize import resize_bilinear
from lednet_tpu.registry import MODELS


@MODELS.register_module()
class UPerHead(_HeadBase):
    pool_scales: Sequence[int] = (1, 2, 3, 6)
    in_index: Sequence[int] = (0, 1, 2, 3)
    input_transform: Optional[str] = 'multiple_select'

    @nn.compact
    def __call__(self, inputs, train: bool = False, with_aux: bool = True):
        norm_cfg = self.norm_cfg or dict(type='BN')
        act_cfg = self.act_cfg or dict(type='ReLU')
        xs = list(select_inputs(inputs, self.in_index, 'multiple_select',
                                self.align_corners))
        # PSP on the deepest
        deep = xs[-1]
        size = deep.shape[-3:-1]
        psp = [deep]
        for s in self.pool_scales:
            p = ConvModule(deep.shape[-1], self.channels, 1, norm_cfg=norm_cfg,
                           act_cfg=act_cfg,
                           name=f'ppm{s}')(adaptive_avg_pool2d(deep, s),
                                           train=train)
            psp.append(resize_bilinear(p, size, self.align_corners))
        psp_out = ConvModule(deep.shape[-1] + len(self.pool_scales) * self.channels,
                             self.channels, 3, padding=1, norm_cfg=norm_cfg,
                             act_cfg=act_cfg, name='psp_bottleneck')(
            jnp.concatenate(psp, axis=-1), train=train)

        # FPN top-down
        laterals = [ConvModule(x.shape[-1], self.channels, 1,
                               norm_cfg=norm_cfg, act_cfg=act_cfg,
                               name=f'lateral{i}')(x, train=train)
                    for i, x in enumerate(xs[:-1])] + [psp_out]
        for i in range(len(laterals) - 1, 0, -1):
            laterals[i - 1] = laterals[i - 1] + resize_bilinear(
                laterals[i], laterals[i - 1].shape[-3:-1], self.align_corners)
        fpn_outs = [ConvModule(self.channels, self.channels, 3, padding=1,
                               norm_cfg=norm_cfg, act_cfg=act_cfg,
                               name=f'fpn{i}')(laterals[i], train=train)
                    for i in range(len(laterals) - 1)] + [laterals[-1]]
        top = fpn_outs[0].shape[-3:-1]
        fpn_outs = [resize_bilinear(f, top, self.align_corners)
                    for f in fpn_outs]
        out = ConvModule(self.channels * len(fpn_outs), self.channels, 3,
                         padding=1, norm_cfg=norm_cfg, act_cfg=act_cfg,
                         name='fpn_bottleneck')(
            jnp.concatenate(fpn_outs, axis=-1), train=train)
        return ClsSeg(self.channels, self.num_out_channels,
                      self.dropout_ratio, name='cls')(out, train=train)


@MODELS.register_module()
class OCRHead(_HeadBase):
    """Cascade head: __call__(inputs, prev_logits).

    Faithful to reference ``ocr_head.py``:

    - ``SpatialGatherModule`` (``:12-37``): per-class softmax of
      ``scale * logits`` over the SPATIAL axis weights the pixel features
      into (B, K, C) object-region descriptors;
    - ``ObjectAttentionBlock`` (``:40-81``): the shared
      ``SelfAttentionBlock`` with 2-conv NORMED query/key projections,
      normed value/out projections, and scaled matmul, followed by a 1x1
      bottleneck over ``cat([context, feats])``. ``scale > 1`` query
      max-pooling is not supported (the reference's un-pool path at
      ``:78-80`` is broken anyway).
    """
    ocr_channels: int = 256
    scale: int = 1

    @nn.compact
    def __call__(self, inputs, prev_output=None, train: bool = False,
                 with_aux: bool = True):
        from lednet_tpu.models.decode_heads.context_heads import \
            SelfAttentionBlock
        norm_cfg = self.norm_cfg or dict(type='BN')
        act_cfg = self.act_cfg or dict(type='ReLU')
        x = select_inputs(inputs, self.in_index, self.input_transform,
                          self.align_corners)
        feats = ConvModule(x.shape[-1], self.channels, 3, padding=1,
                           norm_cfg=norm_cfg, act_cfg=act_cfg,
                           name='bottleneck')(x, train=train)
        if prev_output is None:
            prev_output = jnp.zeros(feats.shape[:-1] + (self.num_classes,),
                                    feats.dtype)
        B, H, W, C = feats.shape
        probs = prev_output.astype(jnp.float32)
        if probs.shape[1:3] != (H, W):
            probs = resize_bilinear(probs, (H, W), self.align_corners)
        # SpatialGatherModule: softmax over pixels, per class
        pix = feats.reshape(B, H * W, C)
        pr = nn.softmax(self.scale * probs.reshape(B, H * W, -1), axis=1)
        regions = jnp.einsum('bnk,bnc->bkc', pr, pix.astype(jnp.float32))
        regions = regions.astype(feats.dtype)[:, :, None, :]  # (B,K,1,C)

        ctx = SelfAttentionBlock(
            key_in_channels=C, query_in_channels=C,
            channels=self.ocr_channels, out_channels=C,
            key_query_num_convs=2, key_query_norm=True,
            value_out_num_convs=1, value_out_norm=True,
            matmul_norm=True, with_out=True,
            norm_cfg=norm_cfg, act_cfg=act_cfg,
            name='object_context')(feats, regions, train=train)

        out = ConvModule(2 * self.channels, self.channels, 1,
                         norm_cfg=norm_cfg, act_cfg=act_cfg,
                         name='project')(jnp.concatenate([ctx, feats], -1),
                                         train=train)
        return ClsSeg(self.channels, self.num_out_channels,
                      self.dropout_ratio, name='cls')(out, train=train)


@MODELS.register_module()
class DepthwiseSeparableFCNHead(FCNHead):
    """Fast-SCNN's head: FCN with separable convs (reference
    ``sep_fcn_head.py``)."""
    dw_act_cfg: Optional[Dict] = None

    @nn.compact
    def __call__(self, inputs, train: bool = False, with_aux: bool = True):
        norm_cfg = self.norm_cfg or dict(type='BN')
        act_cfg = self.act_cfg or dict(type='ReLU')
        x = select_inputs(inputs, self.in_index, self.input_transform,
                          self.align_corners)
        feats = x
        in_ch = x.shape[-1]
        for i in range(self.num_convs):
            feats = _SepConv(in_ch if i == 0 else self.channels,
                             self.channels, self.kernel_size,
                             norm_cfg=norm_cfg, act_cfg=act_cfg,
                             name=f'conv{i}')(feats, train=train)
        if self.concat_input:
            feats = _SepConv(in_ch + self.channels, self.channels,
                             self.kernel_size, norm_cfg=norm_cfg,
                             act_cfg=act_cfg, name='conv_cat')(
                jnp.concatenate([x, feats], axis=-1), train=train)
        return ClsSeg(self.channels, self.num_out_channels,
                      self.dropout_ratio, name='cls')(feats, train=train)


@MODELS.register_module()
class LRASPPHead(_HeadBase):
    """Lite R-ASPP (MobileNetV3; reference ``lraspp_head.py``)."""
    branch_channels: Sequence[int] = (32, 64)
    in_index: Sequence[int] = (0, 1, 2)
    input_transform: Optional[str] = 'multiple_select'

    @nn.compact
    def __call__(self, inputs, train: bool = False, with_aux: bool = True):
        from lednet_tpu.ops import avg_pool2d
        norm_cfg = self.norm_cfg or dict(type='BN')
        act_cfg = self.act_cfg or dict(type='ReLU')
        xs = select_inputs(inputs, self.in_index, 'multiple_select',
                           self.align_corners)
        deep = xs[-1]
        x = ConvModule(deep.shape[-1], self.channels, 1, bias=False,
                       norm_cfg=norm_cfg, act_cfg=act_cfg,
                       name='aspp_conv')(deep, train=train)
        # SPATIAL image-pool gate: AvgPool2d(49, stride=(16, 20)) + 1x1 +
        # sigmoid, bilinearly resized back (reference lraspp_head.py:60-79).
        # Kernel is clamped to the feature size so small inputs stay legal
        # (the reference simply errors below 49px at 1/16 scale).
        H, W = deep.shape[-3], deep.shape[-2]
        pooled = avg_pool2d(deep, (min(49, H), min(49, W)), (16, 20), 0)
        gate = ConvModule(deep.shape[-1], self.channels, 1, bias=False,
                          norm_cfg=None, act_cfg=dict(type='Sigmoid'),
                          name='image_pool')(pooled, train=train)
        x = x * resize_bilinear(gate, x.shape[-3:-1], self.align_corners)
        # plain 1x1 conv with bias (reference conv_up_input)
        x = nn.Conv(self.channels, (1, 1), name='conv_up_input')(x)
        for bi in range(len(self.branch_channels) - 1, -1, -1):
            mid = xs[bi]
            x = resize_bilinear(x, mid.shape[-3:-1], self.align_corners)
            # branch convs are plain bias-free 1x1 convs, NO norm
            # (reference lraspp_head.py:36-40)
            proj = nn.Conv(self.branch_channels[bi], (1, 1), use_bias=False,
                           name=f'convs{bi}')(mid)
            x = jnp.concatenate([x, proj], axis=-1)
            x = ConvModule(x.shape[-1], self.channels, 1, bias=False,
                           norm_cfg=norm_cfg, act_cfg=act_cfg,
                           name=f'conv_up{bi}')(x, train=train)
        return ClsSeg(self.channels, self.num_out_channels,
                      self.dropout_ratio, name='cls')(x, train=train)


@MODELS.register_module()
class NLHead(_HeadBase):
    """FCN tail with a non-local block (reference ``nl_head.py`` wrapping
    mmcv ``NonLocal2d``): embedded-gaussian attention, a NORMED 1x1
    conv_out projection, residual add, then the FCNHead ``concat_input``
    conv_cat (reference default True)."""
    reduction: int = 2
    use_scale: bool = True
    concat_input: bool = True

    @nn.compact
    def __call__(self, inputs, train: bool = False, with_aux: bool = True):
        norm_cfg = self.norm_cfg or dict(type='BN')
        x = select_inputs(inputs, self.in_index, self.input_transform,
                          self.align_corners)

        def nl_block(feats):
            B, H, W, C = feats.shape
            inter = max(C // self.reduction, 1)
            flat = feats.reshape(B, H * W, C)
            theta = nn.Dense(inter, name='theta')(flat)
            phi = nn.Dense(inter, name='phi')(flat)
            g = nn.Dense(inter, name='g')(flat)
            attn = jnp.einsum('bnc,bmc->bnm', theta, phi,
                              preferred_element_type=jnp.float32)
            if self.use_scale:
                attn = attn * inter ** -0.5
            attn = nn.softmax(attn, axis=-1).astype(feats.dtype)
            y = jnp.einsum(
                'bnm,bmc->bnc', attn, g,
                preferred_element_type=jnp.float32).astype(feats.dtype)
            y = y.reshape(B, H, W, inter)
            # mmcv conv_out: 1x1 ConvModule with norm, no act
            y = ConvModule(inter, C, 1, norm_cfg=norm_cfg, act_cfg=None,
                           name='conv_out')(y, train=train)
            return feats + y

        from lednet_tpu.models.decode_heads.context_heads import _fcn_tail
        feats = _fcn_tail(self, x, nl_block, train)
        return ClsSeg(self.channels, self.num_out_channels,
                      self.dropout_ratio, name='cls')(feats, train=train)
