"""FCN decode head (used standalone and as the auxiliary head of
BiSeNet/HRNet/STDC configs).

Behavioral spec: reference ``mmseg/models/decode_heads/fcn_head.py`` —
``num_convs`` 3x3 (or ``kernel_size``) convs in->ch->ch, optional
``concat_input`` conv on [input, feats], then ``cls_seg``.
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
from lednet_tpu.ops.resize import resize_bilinear
from lednet_tpu.registry import MODELS


@MODELS.register_module()
class FCNHead(nn.Module):
    in_channels: Union[int, Sequence[int]]
    channels: int
    num_classes: int
    num_convs: int = 2
    kernel_size: int = 3
    concat_input: bool = True
    dilation: int = 1
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

    @nn.compact
    def __call__(self, inputs, train: bool = False, with_aux: bool = True):
        norm_cfg = self.norm_cfg or dict(type='BN')
        act_cfg = self.act_cfg or dict(type='ReLU')
        x = select_inputs(inputs, self.in_index, self.input_transform,
                          self.align_corners)
        in_ch = x.shape[-1]
        feats = x
        pad = (self.kernel_size // 2) * self.dilation
        for i in range(self.num_convs):
            feats = ConvModule(in_ch if i == 0 else self.channels,
                               self.channels, self.kernel_size, padding=pad,
                               dilation=self.dilation, norm_cfg=norm_cfg,
                               act_cfg=act_cfg, name=f'conv{i}')(feats, train=train)
        if self.num_convs == 0:
            # reference asserts in_channels == channels here (fcn_head.py:35)
            feats = x
        if self.concat_input:
            feats = ConvModule(in_ch + feats.shape[-1], self.channels,
                               self.kernel_size, padding=self.kernel_size // 2,
                               norm_cfg=norm_cfg, act_cfg=act_cfg,
                               name='conv_cat')(
                jnp.concatenate([x, feats], axis=-1), train=train)
        return ClsSeg(self.channels, self.num_out_channels, self.dropout_ratio,
                      name='cls')(feats, train=train)

    def loss_by_feat(self, seg_logits, seg_label) -> Dict:
        return default_loss_by_feat(seg_logits, seg_label,
                                    build_losses(self.loss_decode),
                                    self.align_corners, self.ignore_index,
                                    sampler=self.sampler)

    def predict_by_feat(self, seg_logits, size=None):
        if size is None:
            return seg_logits
        return resize_bilinear(seg_logits, size, self.align_corners)
