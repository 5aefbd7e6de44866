"""BiSeNetV2 backbone (detail branch + semantic branch + BGA fusion).

Behavioral spec: reference ``mmseg/models/backbones/bisenetv2.py:12-622``:
DetailBranch (3 wide conv stages to 1/8), SemanticBranch (StemBlock ->
GELayers with expansion-6 depthwise stages to 1/32 -> CEBlock global
context), BGALayer (bilateral sigmoid-guided aggregation at 1/8). Outputs
``(bga_out, stem, stage2, stage3, stage4)`` selected by ``out_indices`` —
the four semantic taps feed the FCN booster heads.
"""
from __future__ import annotations

from typing import Dict, Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp

from lednet_tpu.models.layers import ConvModule, Norm2d
from lednet_tpu.ops import avg_pool2d, global_avg_pool, max_pool2d
from lednet_tpu.ops.resize import resize_bilinear
from lednet_tpu.registry import MODELS

_BN = dict(type='BN')
_RELU = dict(type='ReLU')


class _DWSeparable(nn.Module):
    """Depthwise-separable conv; norm on both convs, no activations
    (the BGA/GELayer shortcut flavor)."""
    in_channels: int
    out_channels: int
    stride: int = 1
    pw_norm: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = ConvModule(self.in_channels, self.in_channels, 3,
                       stride=self.stride, padding=1, groups=self.in_channels,
                       norm_cfg=_BN, act_cfg=None, name='dw')(x, train=train)
        x = ConvModule(self.in_channels, self.out_channels, 1,
                       norm_cfg=_BN if self.pw_norm else None, act_cfg=None,
                       bias=not self.pw_norm,
                       name='pw')(x, train=train)
        return x


class StemBlock(nn.Module):
    in_channels: int = 3
    out_channels: int = 16

    @nn.compact
    def __call__(self, x, train: bool = False):
        oc = self.out_channels
        x = ConvModule(self.in_channels, oc, 3, stride=2, padding=1,
                       norm_cfg=_BN, act_cfg=_RELU,
                       name='conv_first')(x, train=train)
        left = ConvModule(oc, oc // 2, 1, norm_cfg=_BN, act_cfg=_RELU,
                          name='convs1')(x, train=train)
        left = ConvModule(oc // 2, oc, 3, stride=2, padding=1, norm_cfg=_BN,
                          act_cfg=_RELU, name='convs2')(left, train=train)
        right = max_pool2d(x, 3, 2, 1)
        return ConvModule(2 * oc, oc, 3, padding=1, norm_cfg=_BN,
                          act_cfg=_RELU, name='fuse_last')(
            jnp.concatenate([left, right], axis=-1), train=train)


class GELayer(nn.Module):
    in_channels: int
    out_channels: int
    exp_ratio: int = 6
    stride: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        mid = self.in_channels * self.exp_ratio
        identity = x
        x = ConvModule(self.in_channels, self.in_channels, 3, padding=1,
                       norm_cfg=_BN, act_cfg=_RELU, name='conv1')(x, train=train)
        if self.stride == 1:
            x = ConvModule(self.in_channels, mid, 3, padding=1,
                           groups=self.in_channels, norm_cfg=_BN,
                           act_cfg=_RELU, name='dwconv')(x, train=train)
        else:
            x = ConvModule(self.in_channels, mid, 3, stride=self.stride,
                           padding=1, groups=self.in_channels, norm_cfg=_BN,
                           act_cfg=None, name='dwconv1')(x, train=train)
            x = ConvModule(mid, mid, 3, padding=1, groups=mid, norm_cfg=_BN,
                           act_cfg=_RELU, name='dwconv2')(x, train=train)
        x = ConvModule(mid, self.out_channels, 1, norm_cfg=_BN, act_cfg=None,
                       name='conv2')(x, train=train)
        if self.stride != 1 or self.in_channels != self.out_channels:
            identity = _DWSeparable(self.in_channels, self.out_channels,
                                    stride=self.stride,
                                    name='shortcut')(identity, train=train)
        return nn.relu(x + identity)


class CEBlock(nn.Module):
    in_channels: int = 3
    out_channels: int = 16

    @nn.compact
    def __call__(self, x, train: bool = False):
        identity = x
        g = Norm2d(_BN, name='gap_norm')(global_avg_pool(x), train=train)
        g = ConvModule(self.in_channels, self.out_channels, 1, norm_cfg=_BN,
                       act_cfg=_RELU, name='conv_gap')(g, train=train)
        x = identity + g
        return ConvModule(self.out_channels, self.out_channels, 3, padding=1,
                          norm_cfg=_BN, act_cfg=_RELU,
                          name='conv_last')(x, train=train)


@MODELS.register_module()
class BiSeNetV2(nn.Module):
    in_channels: int = 3
    detail_channels: Sequence[int] = (64, 64, 128)
    semantic_channels: Sequence[int] = (16, 32, 64, 128)
    semantic_expansion_ratio: int = 6
    bga_channels: int = 128
    out_indices: Sequence[int] = (0, 1, 2, 3, 4)
    align_corners: bool = False
    norm_cfg: Optional[Dict] = None
    act_cfg: Optional[Dict] = None
    init_cfg: Optional[Dict] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        # detail branch
        d = x
        dc = list(self.detail_channels)
        for i, ch in enumerate(dc):
            in_ch = self.in_channels if i == 0 else dc[i - 1]
            d = ConvModule(in_ch, ch, 3, stride=2, padding=1, norm_cfg=_BN,
                           act_cfg=_RELU, name=f'detail{i}_0')(d, train=train)
            n_refine = 1 if i == 0 else 2
            for j in range(n_refine):
                d = ConvModule(ch, ch, 3, padding=1, norm_cfg=_BN,
                               act_cfg=_RELU,
                               name=f'detail{i}_{j + 1}')(d, train=train)

        # semantic branch
        sc = list(self.semantic_channels)
        taps = []
        s = StemBlock(self.in_channels, sc[0], name='stage1')(x, train=train)
        taps.append(s)
        for i in range(1, len(sc)):
            n_layers = 4 if i == len(sc) - 1 else 2
            s = GELayer(sc[i - 1], sc[i], self.semantic_expansion_ratio, 2,
                        name=f'stage{i + 1}_0')(s, train=train)
            for j in range(1, n_layers):
                s = GELayer(sc[i], sc[i], self.semantic_expansion_ratio, 1,
                            name=f'stage{i + 1}_{j}')(s, train=train)
            taps.append(s)
        s = CEBlock(sc[-1], sc[-1], name='ce_block')(s, train=train)

        # BGA fusion
        oc = self.bga_channels
        detail_dw = _DWSeparable(oc, oc, pw_norm=False,
                                 name='detail_dwconv')(d, train=train)
        detail_down = ConvModule(oc, oc, 3, stride=2, padding=1, norm_cfg=_BN,
                                 act_cfg=None, name='detail_down')(d, train=train)
        detail_down = avg_pool2d(detail_down, 3, 2, 1)
        semantic_conv = ConvModule(oc, oc, 3, padding=1, norm_cfg=_BN,
                                   act_cfg=None,
                                   name='semantic_conv')(s, train=train)
        semantic_dw = _DWSeparable(oc, oc, pw_norm=False,
                                   name='semantic_dwconv')(s, train=train)
        semantic_conv = resize_bilinear(semantic_conv, detail_dw.shape[-3:-1],
                                        self.align_corners)
        fuse_1 = detail_dw * nn.sigmoid(semantic_conv)
        fuse_2 = detail_down * nn.sigmoid(semantic_dw)
        fuse_2 = resize_bilinear(fuse_2, fuse_1.shape[-3:-1],
                                 self.align_corners)
        head = ConvModule(oc, oc, 3, padding=1, norm_cfg=_BN, act_cfg=_RELU,
                          name='bga_conv')(fuse_1 + fuse_2, train=train)

        outs = [head] + taps
        return tuple(outs[i] for i in self.out_indices)
