"""Semantic-FPN and SCTNet heads.

Behavioral specs: reference ``mmseg/models/decode_heads/fpn_head.py:10-67``
(per-level scale heads — conv[+2x upsample] chains to the finest stride —
summed, then ``cls_seg``) and ``sct_head.py:10-28`` (pre-activation
bn-relu-conv then bn-relu-``cls_seg``; the reference's two-output train
path returns the decoder feature for SCTNet's distillation losses, which
its broken legacy registration never exercises — here the head returns the
logits like every other single-tensor head).
"""
from __future__ import annotations

import math
from typing import Dict, Optional, Sequence, Union

import flax.linen as nn

from lednet_tpu.models.decode_heads.base import (ClsSeg, build_losses,
                                                 default_loss_by_feat,
                                                 resolve_out_channels,
                                                 select_inputs)
from lednet_tpu.models.layers import ConvModule, Norm2d
from lednet_tpu.ops.resize import resize_bilinear
from lednet_tpu.registry import MODELS


class _HeadMixin:

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
class FPNHead(nn.Module, _HeadMixin):
    """Panoptic/Semantic FPN head (reference ``fpn_head.py``)."""
    in_channels: Sequence[int] = (256, 256, 256, 256)
    channels: int = 128
    num_classes: int = 19
    feature_strides: Sequence[int] = (4, 8, 16, 32)
    dropout_ratio: float = 0.1
    norm_cfg: Optional[Dict] = None
    act_cfg: Optional[Dict] = None
    align_corners: bool = False
    ignore_index: int = 255
    in_index: Sequence[int] = (0, 1, 2, 3)
    input_transform: str = 'multiple_select'
    out_channels: Optional[int] = None
    threshold: Optional[float] = None
    loss_decode: Optional[Dict] = None
    sampler: Optional[Dict] = None
    init_cfg: Optional[Dict] = None

    @nn.compact
    def __call__(self, inputs, train: bool = False, with_aux: bool = True):
        assert len(self.feature_strides) == len(self.in_channels)
        norm_cfg = self.norm_cfg or dict(type='BN')
        act_cfg = self.act_cfg or dict(type='ReLU')
        x = select_inputs(inputs, self.in_index, self.input_transform,
                          self.align_corners)
        base = self.feature_strides[0]
        output = None
        for i, stride in enumerate(self.feature_strides):
            head_length = max(1, int(math.log2(stride) - math.log2(base)))
            t = x[i]
            for k in range(head_length):
                t = ConvModule(t.shape[-1], self.channels, 3, padding=1,
                               norm_cfg=norm_cfg, act_cfg=act_cfg,
                               name=f'scale{i}_conv{k}')(t, train=train)
                if stride != base:
                    h, w = t.shape[-3:-1]
                    t = resize_bilinear(t, (h * 2, w * 2),
                                        self.align_corners)
            if output is None:
                output = t
            else:
                output = output + resize_bilinear(t, output.shape[-3:-1],
                                                  self.align_corners)
        return ClsSeg(self.channels, self.num_out_channels,
                      self.dropout_ratio, name='cls')(output, train=train)


@MODELS.register_module()
class SCTHead(nn.Module, _HeadMixin):
    """SCTNet head (reference ``sct_head.py``): bn-relu-conv3x3 then
    bn-relu-``cls_seg``."""
    in_channels: int = 256
    channels: int = 128
    num_classes: int = 19
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

    @nn.compact
    def __call__(self, inputs, train: bool = False, with_aux: bool = True):
        norm_cfg = self.norm_cfg or dict(type='BN')
        x = select_inputs(inputs, self.in_index, self.input_transform,
                          self.align_corners)
        x = ConvModule(x.shape[-1], self.channels, 3, padding=1,
                       norm_cfg=norm_cfg, act_cfg=dict(type='ReLU'),
                       order=('norm', 'act', 'conv'),
                       name='conv1')(x, train=train)
        x = Norm2d(norm_cfg, name='bn2')(x, train=train)
        x = nn.relu(x)
        return ClsSeg(self.channels, self.num_out_channels,
                      self.dropout_ratio, name='cls')(x, train=train)
