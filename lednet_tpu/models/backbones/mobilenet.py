"""MobileNetV2 / V3 backbones.

Behavioral specs: reference ``mmseg/models/backbones/mobilenet_v2.py`` (the
dilated variant with per-stage strides/dilations for dense prediction) and
``mobilenet_v3.py`` (arch small/large with SE blocks and h-swish).
"""
from __future__ import annotations

from typing import Dict, Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp

from lednet_tpu.models.backbones.fast_scnn import InvertedResidual
from lednet_tpu.models.layers import ConvModule, Norm2d
from lednet_tpu.ops import global_avg_pool
from lednet_tpu.registry import MODELS


class _DilatedInvertedResidual(nn.Module):
    in_channels: int
    out_channels: int
    stride: int = 1
    dilation: int = 1
    expand_ratio: int = 6
    norm_cfg: Optional[Dict] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        norm_cfg = self.norm_cfg or dict(type='BN')
        act = dict(type='ReLU6')
        mid = self.in_channels * self.expand_ratio
        h = x
        if self.expand_ratio != 1:
            h = ConvModule(self.in_channels, mid, 1, norm_cfg=norm_cfg,
                           act_cfg=act, name='expand')(h, train=train)
        h = ConvModule(mid, mid, 3, stride=self.stride,
                       padding=self.dilation, dilation=self.dilation,
                       groups=mid, norm_cfg=norm_cfg, act_cfg=act,
                       name='dw')(h, train=train)
        h = ConvModule(mid, self.out_channels, 1, norm_cfg=norm_cfg,
                       act_cfg=None, name='project')(h, train=train)
        if self.stride == 1 and self.in_channels == self.out_channels:
            return x + h
        return h


@MODELS.register_module()
class MobileNetV2(nn.Module):
    widen_factor: float = 1.0
    strides: Sequence[int] = (1, 2, 2, 2, 1, 2, 1)
    dilations: Sequence[int] = (1, 1, 1, 1, 1, 1, 1)
    out_indices: Sequence[int] = (1, 2, 4, 6)
    norm_cfg: Optional[Dict] = None
    act_cfg: Optional[Dict] = None
    pretrained: Optional[str] = None
    init_cfg: Optional[Dict] = None

    # (expand_ratio, channels, num_blocks) per stage
    arch_settings = [(1, 16, 1), (6, 24, 2), (6, 32, 3), (6, 64, 4),
                     (6, 96, 3), (6, 160, 3), (6, 320, 1)]

    @nn.compact
    def __call__(self, x, train: bool = False):
        norm_cfg = self.norm_cfg or dict(type='BN')
        wf = self.widen_factor
        in_ch = make_divisible(32 * wf, 8)
        x = ConvModule(3, in_ch, 3, stride=2, padding=1, norm_cfg=norm_cfg,
                       act_cfg=dict(type='ReLU6'), name='conv1')(x, train=train)
        outs = []
        for i, (t, c, n) in enumerate(self.arch_settings):
            out_ch = make_divisible(c * wf, 8)
            for j in range(n):
                # stride AND dilation apply to the first block only
                # (reference mobilenet_v2.py:149-157: ``dilation if i == 0
                # else 1`` — later blocks in a dilated stage stay dilation 1)
                stride = self.strides[i] if j == 0 else 1
                dilation = self.dilations[i] if j == 0 else 1
                x = _DilatedInvertedResidual(
                    in_ch, out_ch, stride, dilation, t,
                    norm_cfg=norm_cfg, name=f'layer{i + 1}_{j}')(x, train=train)
                in_ch = out_ch
            outs.append(x)
        return tuple(outs[i] for i in self.out_indices)


def make_divisible(value, divisor=8, min_value=None, min_ratio=0.9):
    """Reference ``mmseg/models/utils/make_divisible.py``: round to the
    nearest multiple of ``divisor``, never dropping below ``min_ratio``
    of the original value."""
    if min_value is None:
        min_value = divisor
    new_value = max(min_value, int(value + divisor / 2) // divisor * divisor)
    if new_value < min_ratio * value:
        new_value += divisor
    return new_value


class _SEBlock(nn.Module):
    channels: int
    ratio: int = 4

    @nn.compact
    def __call__(self, x):
        g = global_avg_pool(x)
        # reference se_layer.py:41: squeeze width is make_divisible(c/r, 8)
        g = nn.Conv(make_divisible(self.channels // self.ratio, 8), (1, 1),
                    name='fc1')(g)
        g = nn.relu(g)
        g = nn.Conv(self.channels, (1, 1), name='fc2')(g)
        # HSigmoid(bias=3, divisor=6): clip((x + 3) / 6, 0, 1)
        g = jnp.clip(g / 6.0 + 0.5, 0, 1)
        return x * g


@MODELS.register_module()
class MobileNetV3(nn.Module):
    arch: str = 'small'
    out_indices: Sequence[int] = (0, 1, 12)
    norm_cfg: Optional[Dict] = None
    pretrained: Optional[str] = None
    init_cfg: Optional[Dict] = None

    # (kernel, mid, out, SE, act, stride)
    arch_settings = {
        'small': [(3, 16, 16, True, 'ReLU', 2), (3, 72, 24, False, 'ReLU', 2),
                  (3, 88, 24, False, 'ReLU', 1), (5, 96, 40, True, 'HSwish', 2),
                  (5, 240, 40, True, 'HSwish', 1), (5, 240, 40, True, 'HSwish', 1),
                  (5, 120, 48, True, 'HSwish', 1), (5, 144, 48, True, 'HSwish', 1),
                  (5, 288, 96, True, 'HSwish', 2), (5, 576, 96, True, 'HSwish', 1),
                  (5, 576, 96, True, 'HSwish', 1)],
        'large': [(3, 16, 16, False, 'ReLU', 1), (3, 64, 24, False, 'ReLU', 2),
                  (3, 72, 24, False, 'ReLU', 1), (5, 72, 40, True, 'ReLU', 2),
                  (5, 120, 40, True, 'ReLU', 1), (5, 120, 40, True, 'ReLU', 1),
                  (3, 240, 80, False, 'HSwish', 2), (3, 200, 80, False, 'HSwish', 1),
                  (3, 184, 80, False, 'HSwish', 1), (3, 184, 80, False, 'HSwish', 1),
                  (3, 480, 112, True, 'HSwish', 1), (3, 672, 112, True, 'HSwish', 1),
                  (5, 672, 160, True, 'HSwish', 2), (5, 960, 160, True, 'HSwish', 1),
                  (5, 960, 160, True, 'HSwish', 1)],
    }

    reduction_factor: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        """Segmentation variant of MobileNetV3 (reference
        ``mobilenet_v3.py:129-243``): TF-SAME-padded stem, InvertedResidual
        blocks, a final 1x1 conv to 576 ('small') / 960 ('large') HSwish
        channels, and the dense-prediction conversion — the two deep
        stride-2 depthwise convs are reset to stride 1 (their residual
        stays OFF, as the reference mutates the conv after construction)
        and later depthwise convs are dilated 2x then 4x (os=8)."""
        norm_cfg = self.norm_cfg or dict(type='BN')
        small = self.arch == 'small'
        settings = self.arch_settings[self.arch]
        # layer index (stem = layer0) thresholds of the conversion
        dil2_start = 4 if small else 7          # dilation 2 from this layer
        dil4_start = 9 if small else 13         # dilation 4 from this layer
        stride_reset = {3, 8} if small else {6, 12}   # 0-based block idx
        red_start = 8 if small else 12          # reduction_factor applies

        def act_fn(name):
            return nn.hard_swish if name == 'HSwish' else nn.relu

        in_ch = 16
        # stem: Conv2dAdaptivePadding == TF 'SAME'
        h = nn.Conv(in_ch, (3, 3), strides=(2, 2), padding='SAME',
                    use_bias=False, name='stem_conv')(x)
        h = Norm2d(norm_cfg, name='stem_norm')(h, train=train)
        x = nn.hard_swish(h)
        outs = [x]
        for i, (k, mid, out_ch, se, act, stride) in enumerate(settings):
            layer_idx = i + 1
            if i >= red_start:
                mid = mid // self.reduction_factor
                out_ch = out_ch // self.reduction_factor
            # residual decided by the ORIGINAL stride (the reference builds
            # the block with stride 2, then mutates only the conv's stride)
            residual = stride == 1 and in_ch == out_ch
            if i in stride_reset:
                stride = 1
            if layer_idx >= dil4_start:
                dil = 4
            elif layer_idx >= dil2_start:
                dil = 2
            else:
                dil = 1
            pad = dil * (k - 1) // 2
            identity = x
            h = x
            if mid != in_ch:
                h = ConvModule(in_ch, mid, 1, norm_cfg=norm_cfg, act_cfg=None,
                               name=f'b{i}_expand')(h, train=train)
                h = act_fn(act)(h)
            h = ConvModule(mid, mid, k, stride=stride, padding=pad,
                           dilation=dil, groups=mid, norm_cfg=norm_cfg,
                           act_cfg=None, name=f'b{i}_dw')(h, train=train)
            h = act_fn(act)(h)
            if se:
                h = _SEBlock(mid, name=f'b{i}_se')(h)
            h = ConvModule(mid, out_ch, 1, norm_cfg=norm_cfg, act_cfg=None,
                           name=f'b{i}_project')(h, train=train)
            if residual:
                h = h + identity
            x = h
            in_ch = out_ch
            outs.append(x)
        # final layer: 1x1 conv to 576/960 (dilation-4 on a 1x1 is a no-op)
        h = ConvModule(in_ch, 576 if small else 960, 1, norm_cfg=norm_cfg,
                       act_cfg=None, name='final_conv')(x, train=train)
        outs.append(nn.hard_swish(h))
        return tuple(outs[i] for i in self.out_indices)
