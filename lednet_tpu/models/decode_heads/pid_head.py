"""PIDNet decode head.

Behavioral spec from the reference ``mmseg/models/decode_heads/pid_head.py``:
three pre-act heads (p/i/d); training returns (p_logit, i_logit, d_logit
[1-channel boundary]); losses: CE(w=0.4) on p, OHEM on i, BoundaryLoss on d,
plus the boundary-gated OHEM on i where pixels with sigmoid(d) <= 0.8 are
ignored (``:151-183``); inference uses only the i head.
"""
from __future__ import annotations

from typing import Dict, Optional, Sequence, Tuple, Union

import flax.linen as nn
import jax
import jax.numpy as jnp

from lednet_tpu.models.decode_heads.base import (build_losses,
                                                 resolve_out_channels)
from lednet_tpu.models.decode_heads.led_head import _BaseHead
from lednet_tpu.models.layers import kaiming_init
from lednet_tpu.models.losses.cross_entropy import accuracy
from lednet_tpu.ops.resize import resize_bilinear
from lednet_tpu.registry import MODELS


@MODELS.register_module()
class PIDHead(nn.Module):
    in_channels: int
    channels: int
    num_classes: int
    dropout_ratio: float = 0.1
    norm_cfg: Optional[Dict] = None
    act_cfg: Optional[Dict] = None
    align_corners: bool = False
    ignore_index: int = 255
    out_channels: Optional[int] = None
    threshold: Optional[float] = None
    loss_decode: Optional[Sequence[Dict]] = None
    in_index: int = -1
    init_cfg: Optional[Dict] = None

    @property
    def num_out_channels(self) -> int:
        return resolve_out_channels(self.num_classes, self.out_channels,
                                    self.threshold)[0]

    @nn.compact
    def __call__(self, inputs, train: bool = False, with_aux: bool = True):
        out_ch = self.num_out_channels
        if isinstance(inputs, (tuple, list)) and len(inputs) == 3:
            x_p, x_i, x_d = inputs
        else:
            x_p = x_d = None
            x_i = inputs[1] if isinstance(inputs, (tuple, list)) else inputs

        i_feat = _BaseHead(self.in_channels, self.channels, self.norm_cfg,
                           self.act_cfg, name='i_head')(x_i, train=train)
        if self.dropout_ratio > 0:
            i_feat = nn.Dropout(self.dropout_ratio,
                                deterministic=not train)(i_feat)
        i_logit = nn.Conv(out_ch, (1, 1), use_bias=True,
                          kernel_init=kaiming_init, name='cls_seg')(i_feat)
        if not (with_aux and x_p is not None):
            return i_logit

        p_feat = _BaseHead(self.in_channels // 2, self.channels, self.norm_cfg,
                           self.act_cfg, name='p_head')(x_p, train=train)
        p_logit = nn.Conv(out_ch, (1, 1), use_bias=True,
                          kernel_init=kaiming_init, name='p_cls_seg')(p_feat)
        d_feat = _BaseHead(self.in_channels // 2, self.in_channels // 4,
                           self.norm_cfg, self.act_cfg,
                           name='d_head')(x_d, train=train)
        d_logit = nn.Conv(1, (1, 1), use_bias=True, kernel_init=kaiming_init,
                          name='d_cls_seg')(d_feat)
        return p_logit, i_logit, d_logit

    def loss_by_feat(self, seg_logits: Tuple, seg_label) -> Dict:
        p_logit, i_logit, d_logit = seg_logits
        if isinstance(seg_label, dict):
            sem_label = seg_label['gt_seg_map']
            bd_label = seg_label.get('gt_edge_map')
        else:
            sem_label, bd_label = seg_label, None
        size = sem_label.shape[-2:]
        losses = build_losses(self.loss_decode)
        p_logit = resize_bilinear(p_logit, size, self.align_corners)
        i_logit = resize_bilinear(i_logit, size, self.align_corners)
        d_logit = resize_bilinear(d_logit, size, self.align_corners)

        out = {
            'loss_sem_p': losses[0](p_logit, sem_label,
                                    ignore_index=self.ignore_index),
            'loss_sem_i': losses[1](i_logit, sem_label),
        }
        if bd_label is not None and len(losses) >= 4:
            out['loss_bd'] = losses[2](d_logit, bd_label)
            gate = jax.nn.sigmoid(d_logit[..., 0]) > 0.8
            sem_bd_label = jnp.where(gate, sem_label, self.ignore_index)
            out['loss_sem_bd'] = losses[3](i_logit, sem_bd_label)
        out['acc_seg'] = accuracy(i_logit, sem_label, self.ignore_index)
        return out

    def predict_by_feat(self, seg_logits, size=None):
        logit = seg_logits
        if size is None:
            size = (logit.shape[-3] * 8, logit.shape[-2] * 8)
        return resize_bilinear(logit, size, self.align_corners)
