"""ResNet / ResNetV1c backbone family.

Behavioral spec: reference ``mmseg/models/backbones/resnet.py`` (mmcv-style):
``style='pytorch'`` (stride on the 3x3 conv of Bottleneck), per-stage
``strides``/``dilations`` (the d8 variant uses strides (1,2,1,1) + dilations
(1,1,2,4) for dense prediction), ``out_indices`` selecting stage outputs,
optional deep stem (V1c: three 3x3 convs) and ``avg_down``, ``contract_dilation``
halving the first dilated block's rate.
"""
from __future__ import annotations

from typing import Dict, Optional, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from lednet_tpu.models.layers import ConvModule, Norm2d, kaiming_init
from lednet_tpu.ops import avg_pool2d, max_pool2d
from lednet_tpu.registry import MODELS


class _ResBasicBlock(nn.Module):
    in_channels: int
    channels: int
    stride: int = 1
    dilation: int = 1
    downsample: bool = False
    avg_down: bool = False
    norm_cfg: Optional[Dict] = None
    expansion: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        norm_cfg = self.norm_cfg or dict(type='BN')
        identity = x
        out = ConvModule(self.in_channels, self.channels, 3,
                         stride=self.stride, padding=self.dilation,
                         dilation=self.dilation, norm_cfg=norm_cfg,
                         act_cfg=dict(type='ReLU'), name='conv1')(x, train=train)
        out = ConvModule(self.channels, self.channels, 3, padding=1,
                         norm_cfg=norm_cfg, act_cfg=None,
                         name='conv2')(out, train=train)
        if self.downsample:
            identity = x
            stride = self.stride
            if self.avg_down and stride != 1:
                # reference res_layer.py: AvgPool2d(stride, stride,
                # ceil_mode=True, count_include_pad=False)
                identity = avg_pool2d(identity, stride, stride, 0,
                                      count_include_pad=False,
                                      ceil_mode=True)
                stride = 1
            identity = nn.Conv(self.channels * self.expansion, (1, 1),
                               strides=(stride, stride), use_bias=False,
                               kernel_init=kaiming_init,
                               name='downsample_conv')(identity)
            identity = Norm2d(norm_cfg, name='downsample_norm')(identity,
                                                                train=train)
        return nn.relu(out + identity)


class _ResBottleneck(nn.Module):
    in_channels: int
    channels: int
    stride: int = 1
    dilation: int = 1
    downsample: bool = False
    avg_down: bool = False
    norm_cfg: Optional[Dict] = None
    expansion: int = 4

    @nn.compact
    def __call__(self, x, train: bool = False):
        norm_cfg = self.norm_cfg or dict(type='BN')
        identity = x
        out = ConvModule(self.in_channels, self.channels, 1, norm_cfg=norm_cfg,
                         act_cfg=dict(type='ReLU'), name='conv1')(x, train=train)
        out = ConvModule(self.channels, self.channels, 3, stride=self.stride,
                         padding=self.dilation, dilation=self.dilation,
                         norm_cfg=norm_cfg, act_cfg=dict(type='ReLU'),
                         name='conv2')(out, train=train)
        out = ConvModule(self.channels, self.channels * self.expansion, 1,
                         norm_cfg=norm_cfg, act_cfg=None,
                         name='conv3')(out, train=train)
        if self.downsample:
            identity = x
            stride = self.stride
            if self.avg_down and stride != 1:
                # reference res_layer.py: AvgPool2d(stride, stride,
                # ceil_mode=True, count_include_pad=False)
                identity = avg_pool2d(identity, stride, stride, 0,
                                      count_include_pad=False,
                                      ceil_mode=True)
                stride = 1
            identity = nn.Conv(self.channels * self.expansion, (1, 1),
                               strides=(stride, stride), use_bias=False,
                               kernel_init=kaiming_init,
                               name='downsample_conv')(identity)
            identity = Norm2d(norm_cfg, name='downsample_norm')(identity,
                                                                train=train)
        return nn.relu(out + identity)


@MODELS.register_module()
class ResNet(nn.Module):
    depth: int = 50
    in_channels: int = 3
    stem_channels: int = 64
    base_channels: int = 64
    num_stages: int = 4
    strides: Sequence[int] = (1, 2, 2, 2)
    dilations: Sequence[int] = (1, 1, 1, 1)
    out_indices: Sequence[int] = (0, 1, 2, 3)
    deep_stem: bool = False
    avg_down: bool = False
    contract_dilation: bool = False
    multi_grid: Optional[Sequence[int]] = None
    norm_cfg: Optional[Dict] = None
    act_cfg: Optional[Dict] = None
    frozen_stages: int = -1
    norm_eval: bool = False
    style: str = 'pytorch'
    pretrained: Optional[str] = None
    init_cfg: Optional[Dict] = None
    with_cp: bool = False
    # ICNet patches the torch maxpool to ceil_mode=True
    # (reference ``icnet.py:72-74``)
    ceil_maxpool: bool = False

    arch_settings = {
        18: (_ResBasicBlock, (2, 2, 2, 2)),
        34: (_ResBasicBlock, (3, 4, 6, 3)),
        50: (_ResBottleneck, (3, 4, 6, 3)),
        101: (_ResBottleneck, (3, 4, 23, 3)),
        152: (_ResBottleneck, (3, 8, 36, 3)),
    }

    @nn.compact
    def __call__(self, x, train: bool = False, stage_range=None):
        """``stage_range=(lo, hi)`` runs only stages ``lo..hi-1`` (skipping
        the stem when ``lo > 0``, with the input taken as the ``lo-1`` stage
        feature) and returns those stages' outputs — the re-entry surface
        ICNet needs (reference ``icnet.py:146-159`` calls
        ``backbone.layer3/layer4`` directly)."""
        norm_cfg = self.norm_cfg or dict(type='BN')
        act = dict(type='ReLU')
        block_cls, stage_blocks = self.arch_settings[self.depth]
        expansion = block_cls.expansion
        lo, hi = stage_range if stage_range is not None \
            else (0, self.num_stages)

        if lo > 0:
            return self._stages(x, lo, hi, block_cls, stage_blocks,
                                expansion, norm_cfg, train)
        if self.deep_stem:
            mid = self.stem_channels // 2
            x = ConvModule(self.in_channels, mid, 3, stride=2, padding=1,
                           norm_cfg=norm_cfg, act_cfg=act,
                           name='stem1')(x, train=train)
            x = ConvModule(mid, mid, 3, padding=1, norm_cfg=norm_cfg,
                           act_cfg=act, name='stem2')(x, train=train)
            x = ConvModule(mid, self.stem_channels, 3, padding=1,
                           norm_cfg=norm_cfg, act_cfg=act,
                           name='stem3')(x, train=train)
        else:
            x = ConvModule(self.in_channels, self.stem_channels, 7, stride=2,
                           padding=3, norm_cfg=norm_cfg, act_cfg=act,
                           name='stem')(x, train=train)
        if self.ceil_maxpool:
            # ceil_mode: extra bottom/right padding so no edge is dropped
            eh = (-(x.shape[1] + 2 - 3)) % 2
            ew = (-(x.shape[2] + 2 - 3)) % 2
            if eh or ew:
                pad = jnp.finfo(x.dtype).min if jnp.issubdtype(
                    x.dtype, jnp.floating) else jnp.iinfo(x.dtype).min
                x = jnp.pad(x, ((0, 0), (0, eh), (0, ew), (0, 0)),
                            constant_values=pad)
        x = max_pool2d(x, 3, 2, 1)

        outs = self._stages(x, lo, hi, block_cls, stage_blocks, expansion,
                            norm_cfg, train)
        if stage_range is not None:
            # explicit range: the caller addresses stages directly;
            # out_indices must not filter (ICNet needs the stage-2 feature
            # whatever out_indices the wrapped config carries)
            return outs
        return tuple(outs[i] for i in self.out_indices)

    def _block_kwargs(self):
        """Extra per-block ctor kwargs; subclasses forward their knobs
        (ResNeXt groups/base_width, ResNeSt radix/reduction_factor)."""
        return {}

    def _stages(self, x, lo, hi, block_cls, stage_blocks, expansion,
                norm_cfg, train):
        outs = []
        in_ch = x.shape[-1]
        for i in range(lo, hi):
            planes = self.base_channels * 2 ** i
            stride = self.strides[i]
            dilation = self.dilations[i]
            for j in range(stage_blocks[i]):
                if self.multi_grid is not None and i == self.num_stages - 1:
                    # reference res_layer.py:68-92 — multi_grid entries are
                    # ABSOLUTE per-block dilations for the last stage
                    d = self.multi_grid[j % len(self.multi_grid)]
                elif j == 0 and dilation > 1 and self.contract_dilation:
                    d = dilation // 2
                else:
                    d = dilation
                s = stride if j == 0 else 1
                needs_down = (s != 1 or in_ch != planes * expansion)
                x = block_cls(in_ch, planes, stride=s, dilation=d,
                              downsample=needs_down, avg_down=self.avg_down,
                              norm_cfg=norm_cfg, **self._block_kwargs(),
                              name=f'layer{i + 1}_{j}')(x, train=train)
                in_ch = planes * expansion
            outs.append(x)
        return tuple(outs)


@MODELS.register_module()
class ResNetV1c(ResNet):
    """ResNet with the 3x 3x3 deep stem (mmseg's default for dilated FCN)."""
    deep_stem: bool = True


@MODELS.register_module()
class ResNetV1d(ResNet):
    deep_stem: bool = True
    avg_down: bool = True
