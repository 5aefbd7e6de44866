"""STDC detail-guidance head.

Behavioral spec: reference ``mmseg/models/decode_heads/stdc_head.py:14-97``:
an FCN head whose loss target is a Laplacian-derived boundary map of the
label — fixed 3x3 Laplacian at strides 1/2/4, clamp, binarize at 0.1,
nearest-upsample, fuse with the fixed [0.6, 0.3, 0.1] kernel, binarize — fed
to the configured BCE+Dice losses (the detail losses of the STDC paper).
"""
from __future__ import annotations

from typing import Dict

import jax.numpy as jnp

from lednet_tpu.models.decode_heads.base import (build_losses,
                                                 default_loss_by_feat,
                                                 sem_label)
from lednet_tpu.models.decode_heads.fcn_head import FCNHead
from lednet_tpu.models.seam import _laplacian_conv
from lednet_tpu.ops.resize import resize_nearest
from lednet_tpu.registry import MODELS


@MODELS.register_module()
class STDCHead(FCNHead):
    boundary_threshold: float = 0.1

    def loss_by_feat(self, seg_logits, seg_label) -> Dict:
        label = sem_label(seg_label).astype(jnp.float32)[..., None]

        def binarize(t):
            return jnp.where(t > self.boundary_threshold, 1.0, 0.0)

        b1 = binarize(jnp.maximum(_laplacian_conv(label, 1), 0))
        b2 = jnp.maximum(_laplacian_conv(label, 2), 0)
        b4 = jnp.maximum(_laplacian_conv(label, 4), 0)
        size = b1.shape[-3:-1]
        b2 = binarize(resize_nearest(b2, size))
        b4 = binarize(resize_nearest(b4, size))
        fused = binarize(0.6 * b1 + 0.3 * b2 + 0.1 * b4)
        boundary_label = fused[..., 0].astype(jnp.int32)

        return default_loss_by_feat(seg_logits, boundary_label,
                                    build_losses(self.loss_decode),
                                    self.align_corners, self.ignore_index)
