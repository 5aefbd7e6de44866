"""Decode-head base contract.

Re-designs the reference's ``BaseDecodeHead``
(``mmseg/models/decode_heads/decode_head.py:41-339``): input selection
(``in_index`` + ``resize_concat``/``multiple_select``), ``cls_seg`` dropout +
1x1 conv, and the loss/predict split. flax modules are stateless, so instead
of torch's ``self.training`` dispatch the head exposes:

- ``__call__(inputs, train)``     -> raw logits (the 'tensor' mode),
- ``loss_by_feat(logits, label)`` -> dict of scalar losses (pure function),
- ``predict_by_feat(logits, size)`` -> full-resolution logits (pure function).
"""
from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence, Union

import flax.linen as nn
import jax.numpy as jnp

from lednet_tpu.models.layers import ConvModule, kaiming_init
from lednet_tpu.models.losses.cross_entropy import accuracy
from lednet_tpu.ops.resize import resize_bilinear
from lednet_tpu.registry import MODELS


def build_losses(loss_decode) -> List[Any]:
    """Build the (possibly multiple) loss callables from config."""
    if loss_decode is None:
        loss_decode = dict(type='CrossEntropyLoss', use_sigmoid=False,
                           loss_weight=1.0)
    if isinstance(loss_decode, (list, tuple)):
        return [MODELS.build(dict(c)) for c in loss_decode]
    return [MODELS.build(dict(loss_decode))]


def select_inputs(inputs, in_index, input_transform: Optional[str],
                  align_corners: bool = False):
    """Reference ``_transform_inputs`` (``decode_head.py:207-234``)."""
    if input_transform == 'resize_concat':
        idx = in_index if isinstance(in_index, (list, tuple)) else [in_index]
        feats = [inputs[i] for i in idx]
        size = feats[0].shape[-3:-1]
        feats = [resize_bilinear(f, size, align_corners) for f in feats]
        return jnp.concatenate(feats, axis=-1)
    if input_transform == 'multiple_select':
        return [inputs[i] for i in in_index]
    if isinstance(inputs, (list, tuple)):
        return inputs[in_index]
    return inputs


class ClsSeg(nn.Module):
    """dropout + 1x1 classifier conv (reference ``cls_seg``,
    ``decode_head.py:241-246``)."""
    channels: int
    out_channels: int
    dropout_ratio: float = 0.1

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.dropout_ratio > 0:
            x = nn.Dropout(self.dropout_ratio, deterministic=not train)(x)
        return nn.Conv(self.out_channels, (1, 1), use_bias=True,
                       kernel_init=kaiming_init, name='conv_seg')(x)


def resolve_out_channels(num_classes: int, out_channels: Optional[int],
                         threshold: Optional[float]):
    """Reference out_channels semantics (``decode_head.py:120-151``):
    default = num_classes; out_channels=1 selects the sigmoid binary path."""
    if out_channels is None:
        out_channels = num_classes
    if out_channels != num_classes and not (num_classes == 2 and out_channels == 1):
        raise ValueError(f'out_channels={out_channels} incompatible with '
                         f'num_classes={num_classes}')
    if out_channels == 1 and threshold is None:
        threshold = 0.3
    return out_channels, threshold


def sem_label(seg_label):
    """Labels may arrive as a dict carrying auxiliary maps (gt_edge_map for
    PIDNet/STDC); plain heads use the semantic map."""
    if isinstance(seg_label, dict):
        return seg_label['gt_seg_map']
    return seg_label


def default_loss_by_feat(seg_logits, seg_label, losses, align_corners: bool,
                         ignore_index: int,
                         sampler=None) -> Dict[str, jnp.ndarray]:
    """Single-tensor-head loss path (reference ``loss_by_feat``,
    ``decode_head.py:292-339``): resize logits to the label, optional pixel
    sampler weights, run every configured loss (accumulating same-named
    ones), add ``acc_seg``."""
    seg_label = sem_label(seg_label)
    seg_logits = resize_bilinear(seg_logits, seg_label.shape[-2:], align_corners)
    seg_weight = None
    if sampler is not None:
        if isinstance(sampler, dict):
            sampler = MODELS.build(dict(sampler))
        seg_weight = sampler.sample(seg_logits, seg_label)
    out: Dict[str, jnp.ndarray] = {}
    for loss_fn in losses:
        name = loss_fn.loss_name
        try:
            val = loss_fn(seg_logits, seg_label, weight=seg_weight,
                          ignore_index=ignore_index)
        except TypeError:
            val = loss_fn(seg_logits, seg_label, ignore_index=ignore_index)
        out[name] = out.get(name, 0.0) + val
    out['acc_seg'] = accuracy(seg_logits, seg_label, ignore_index)
    return out
