"""Deep Aggregation Pyramid Pooling (DAPPM) and its parallel variant (PAPPM).

Behavioral spec from the reference ``mmseg/models/utils/ppm.py:12-192``:

- DAPPM: branch 0 is a 1x1 pre-act conv; branches 1..n-2 are AvgPool(5/2/2,
  9/4/4, 17/8/8) + 1x1 conv; the last branch is global-average-pool + 1x1
  conv. Each pooled branch is bilinearly upsampled back and *hierarchically*
  fused: ``feats[i] = process_i(up(branch_i) + feats[i-1])`` with a 3x3
  pre-act conv. Output = compression(concat(feats)) + shortcut(input).
  NOTE: the reference's DAPPM upsample does NOT pass align_corners, so torch
  uses align_corners=False; PAPPM passes align_corners=False explicitly.
- PAPPM: same branches but the per-scale 3x3 convs are a single grouped conv
  applied to ``concat(branch_i + branch_0)`` in parallel.

All convs use order=('norm','act','conv') and BN momentum 0.1. DDRNet/PIDNet
build their convs bias-free (mmcv ConvModule auto-bias with norm), but
SCTNet's in-repo clone ``DAPPM_head`` (reference ``sctnet.py:362-471``)
uses plain ``Conv2d`` with default bias=True — ``conv_bias`` selects that.
"""
from __future__ import annotations

from typing import Dict, Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp

from lednet_tpu.models.layers import ConvModule
from lednet_tpu.ops import avg_pool2d, global_avg_pool
from lednet_tpu.ops.resize import resize_bilinear

_PRE_ACT = ('norm', 'act', 'conv')


class DAPPM(nn.Module):
    in_channels: int
    branch_channels: int
    out_channels: int
    num_scales: int
    kernel_sizes: Sequence[int] = (5, 9, 17)
    strides: Sequence[int] = (2, 4, 8)
    paddings: Sequence[int] = (2, 4, 8)
    norm_cfg: Optional[Dict] = None
    act_cfg: Optional[Dict] = None
    conv_bias: bool = False

    def _branch_conv(self, name):
        return ConvModule(self.in_channels, self.branch_channels, 1,
                          norm_cfg=self.norm_cfg or dict(type='BN', momentum=0.1),
                          act_cfg=self.act_cfg or dict(type='ReLU'),
                          order=_PRE_ACT, bias=self.conv_bias, name=name)

    @nn.compact
    def __call__(self, x, train: bool = False):
        norm_cfg = self.norm_cfg or dict(type='BN', momentum=0.1)
        act_cfg = self.act_cfg or dict(type='ReLU')
        size = x.shape[-3:-1]

        branches = [self._branch_conv('scale0')(x, train=train)]
        for i in range(1, self.num_scales):
            if i < self.num_scales - 1:
                pooled = avg_pool2d(x, self.kernel_sizes[i - 1],
                                    self.strides[i - 1], self.paddings[i - 1])
            else:
                pooled = global_avg_pool(x)
            branches.append(self._branch_conv(f'scale{i}')(pooled, train=train))

        feats = [branches[0]]
        for i in range(1, self.num_scales):
            up = resize_bilinear(branches[i], size, align_corners=False)
            fused = ConvModule(self.branch_channels, self.branch_channels, 3,
                               padding=1, norm_cfg=norm_cfg, act_cfg=act_cfg,
                               order=_PRE_ACT, bias=self.conv_bias,
                               name=f'process{i - 1}')(up + feats[i - 1], train=train)
            feats.append(fused)

        out = ConvModule(self.branch_channels * self.num_scales,
                         self.out_channels, 1, norm_cfg=norm_cfg,
                         act_cfg=act_cfg, order=_PRE_ACT, bias=self.conv_bias,
                         name='compression')(jnp.concatenate(feats, axis=-1),
                                             train=train)
        shortcut = ConvModule(self.in_channels, self.out_channels, 1,
                              norm_cfg=norm_cfg, act_cfg=act_cfg,
                              order=_PRE_ACT, bias=self.conv_bias,
                              name='shortcut')(x, train=train)
        return out + shortcut


class PAPPM(DAPPM):
    """Parallel variant (PIDNet); single grouped 3x3 conv over all scales."""

    @nn.compact
    def __call__(self, x, train: bool = False):
        norm_cfg = self.norm_cfg or dict(type='BN', momentum=0.1)
        act_cfg = self.act_cfg or dict(type='ReLU')
        size = x.shape[-3:-1]

        x0 = self._branch_conv('scale0')(x, train=train)
        feats = []
        for i in range(1, self.num_scales):
            if i < self.num_scales - 1:
                pooled = avg_pool2d(x, self.kernel_sizes[i - 1],
                                    self.strides[i - 1], self.paddings[i - 1])
            else:
                pooled = global_avg_pool(x)
            branch = self._branch_conv(f'scale{i}')(pooled, train=train)
            feats.append(resize_bilinear(branch, size, align_corners=False) + x0)

        scale_out = ConvModule(
            self.branch_channels * (self.num_scales - 1),
            self.branch_channels * (self.num_scales - 1), 3, padding=1,
            groups=self.num_scales - 1, norm_cfg=norm_cfg, act_cfg=act_cfg,
            order=_PRE_ACT, bias=False,
            name='processes')(jnp.concatenate(feats, axis=-1), train=train)

        out = ConvModule(self.branch_channels * self.num_scales,
                         self.out_channels, 1, norm_cfg=norm_cfg,
                         act_cfg=act_cfg, order=_PRE_ACT, bias=False,
                         name='compression')(
                             jnp.concatenate([x0, scale_out], axis=-1),
                             train=train)
        shortcut = ConvModule(self.in_channels, self.out_channels, 1,
                              norm_cfg=norm_cfg, act_cfg=act_cfg,
                              order=_PRE_ACT, bias=False,
                              name='shortcut')(x, train=train)
        return out + shortcut
