"""Necks: FPN and ICNeck.

Behavioral specs: reference ``mmseg/models/necks/fpn.py`` (lateral 1x1 convs
+ top-down nearest upsample accumulation + 3x3 output convs) and
``mmseg/models/necks/ic_neck.py`` (CascadeFeatureFusion of the ICNet
branches: upsample low, dilated conv vs 1x1 projected high, sum + ReLU; two
fusions returning (24x, 12x, final))."""
from __future__ import annotations

from typing import Dict, Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp

from lednet_tpu.models.layers import ConvModule
from lednet_tpu.ops.resize import resize, resize_bilinear
from lednet_tpu.registry import MODELS


@MODELS.register_module()
class FPN(nn.Module):
    in_channels: Sequence[int]
    out_channels: int
    num_outs: int
    start_level: int = 0
    end_level: int = -1
    add_extra_convs: bool = False
    norm_cfg: Optional[Dict] = None
    act_cfg: Optional[Dict] = None
    upsample_cfg: Optional[Dict] = None
    init_cfg: Optional[Dict] = None

    @nn.compact
    def __call__(self, inputs, train: bool = False):
        assert len(inputs) == len(self.in_channels)
        used = list(range(self.start_level,
                          len(self.in_channels) if self.end_level == -1
                          else self.end_level))
        laterals = [
            ConvModule(self.in_channels[i], self.out_channels, 1,
                       norm_cfg=self.norm_cfg, act_cfg=self.act_cfg,
                       name=f'lateral{i}')(inputs[i], train=train)
            for i in used
        ]
        mode = (self.upsample_cfg or {}).get('mode', 'nearest')
        for i in range(len(laterals) - 1, 0, -1):
            laterals[i - 1] = laterals[i - 1] + resize(
                laterals[i], laterals[i - 1].shape[-3:-1], mode=mode,
                align_corners=False)
        outs = [
            ConvModule(self.out_channels, self.out_channels, 3, padding=1,
                       norm_cfg=self.norm_cfg, act_cfg=self.act_cfg,
                       name=f'fpn{i}')(laterals[i], train=train)
            for i in range(len(laterals))
        ]
        return tuple(outs[:self.num_outs])


class _CascadeFeatureFusion(nn.Module):
    low_channels: int
    high_channels: int
    out_channels: int
    norm_cfg: Optional[Dict] = None
    act_cfg: Optional[Dict] = None
    align_corners: bool = False

    @nn.compact
    def __call__(self, x_low, x_high, train: bool = False):
        norm_cfg = self.norm_cfg or dict(type='BN')
        x_low = resize_bilinear(x_low, x_high.shape[-3:-1],
                                self.align_corners)
        low = ConvModule(self.low_channels, self.out_channels, 3, padding=2,
                         dilation=2, norm_cfg=norm_cfg, act_cfg=None,
                         name='conv_low')(x_low, train=train)
        high = ConvModule(self.high_channels, self.out_channels, 1,
                          norm_cfg=norm_cfg, act_cfg=None,
                          name='conv_high')(x_high, train=train)
        out = nn.relu(low + high)
        return out, low


@MODELS.register_module()
class ICNeck(nn.Module):
    in_channels: Sequence[int] = (64, 256, 256)
    out_channels: int = 128
    norm_cfg: Optional[Dict] = None
    act_cfg: Optional[Dict] = None
    align_corners: bool = False
    init_cfg: Optional[Dict] = None

    @nn.compact
    def __call__(self, inputs, train: bool = False):
        assert len(inputs) == 3
        x_sub1, x_sub2, x_sub4 = inputs
        x_24, low_24 = _CascadeFeatureFusion(
            self.in_channels[2], self.in_channels[1], self.out_channels,
            self.norm_cfg, self.act_cfg, self.align_corners,
            name='cff_24')(x_sub4, x_sub2, train=train)
        x_12, low_12 = _CascadeFeatureFusion(
            self.out_channels, self.in_channels[0], self.out_channels,
            self.norm_cfg, self.act_cfg, self.align_corners,
            name='cff_12')(x_24, x_sub1, train=train)
        return low_24, low_12, x_12


@MODELS.register_module()
class JPU(nn.Module):
    """FastFCN Joint Pyramid Upsampling (reference ``necks/jpu.py``): 3x3
    convs to mid_channels, upsample all to the largest map, concat, then
    parallel depthwise-separable dilated convs (dw act None) concatenated;
    outputs = untouched lower levels + the JPU feature."""
    in_channels: Sequence[int] = (512, 1024, 2048)
    mid_channels: int = 512
    start_level: int = 0
    end_level: int = -1
    dilations: Sequence[int] = (1, 2, 4, 8)
    align_corners: bool = False
    norm_cfg: Optional[Dict] = None
    act_cfg: Optional[Dict] = None
    init_cfg: Optional[Dict] = None

    @nn.compact
    def __call__(self, inputs, train: bool = False):
        assert len(inputs) == len(self.in_channels)
        norm_cfg = self.norm_cfg or dict(type='BN')
        act_cfg = self.act_cfg or dict(type='ReLU')
        end = len(self.in_channels) if self.end_level == -1 else self.end_level
        feats = []
        for i in range(self.start_level, end):
            feats.append(ConvModule(self.in_channels[i], self.mid_channels, 3,
                                    padding=1, norm_cfg=norm_cfg,
                                    act_cfg=act_cfg,
                                    name=f'conv{i}')(inputs[i], train=train))
        size = feats[0].shape[-3:-1]
        feats = [feats[0]] + [resize_bilinear(f, size, self.align_corners)
                              for f in feats[1:]]
        feat = jnp.concatenate(feats, axis=-1)
        in_ch = feat.shape[-1]
        branches = []
        for j, d in enumerate(self.dilations):
            t = ConvModule(in_ch, in_ch, 3, padding=d, dilation=d,
                           groups=in_ch, norm_cfg=norm_cfg, act_cfg=None,
                           name=f'dil{j}_dw')(feat, train=train)
            t = ConvModule(in_ch, self.mid_channels, 1, norm_cfg=norm_cfg,
                           act_cfg=act_cfg,
                           name=f'dil{j}_pw')(t, train=train)
            branches.append(t)
        concat_feat = jnp.concatenate(branches, axis=-1)
        outs = [inputs[i] for i in range(self.start_level, end - 1)]
        outs.append(concat_feat)
        return tuple(outs)


@MODELS.register_module()
class MultiLevelNeck(nn.Module):
    """ViT->head adapter (reference ``necks/multilevel_neck.py``): 1x1
    lateral projections, per-level bilinear rescale by ``scales``, 3x3
    output convs."""
    in_channels: Sequence[int] = (768,)
    out_channels: int = 256
    scales: Sequence[float] = (0.5, 1, 2, 4)
    norm_cfg: Optional[Dict] = None
    act_cfg: Optional[Dict] = None
    init_cfg: Optional[Dict] = None

    @nn.compact
    def __call__(self, inputs, train: bool = False):
        assert len(inputs) == len(self.in_channels)
        laterals = [ConvModule(c, self.out_channels, 1,
                               norm_cfg=self.norm_cfg, act_cfg=self.act_cfg,
                               name=f'lateral{i}')(x, train=train)
                    for i, (x, c) in enumerate(zip(inputs, self.in_channels))]
        if len(laterals) == 1:
            laterals = [laterals[0]] * len(self.scales)
        outs = []
        for i, s in enumerate(self.scales):
            h, w = laterals[i].shape[-3:-1]
            x = resize_bilinear(laterals[i],
                                (int(h * s), int(w * s)), False) \
                if s != 1 else laterals[i]
            outs.append(ConvModule(self.out_channels, self.out_channels, 3,
                                   padding=1, norm_cfg=self.norm_cfg,
                                   act_cfg=self.act_cfg,
                                   name=f'conv{i}')(x, train=train))
        return tuple(outs)


@MODELS.register_module()
class MLANeck(nn.Module):
    """SETR multi-level aggregation (reference ``necks/mla_neck.py``):
    token LayerNorm per level, 1x1 projection, top-down running sum
    (p5 -> p2), 3x3 output convs; outputs are deepest-first
    [o(p5), o(p5+p4), ...] — matching the reference's actual forward
    (its own comment claiming input order is wrong)."""
    in_channels: Sequence[int] = (1024, 1024, 1024, 1024)
    out_channels: int = 256
    norm_cfg: Optional[Dict] = None
    act_cfg: Optional[Dict] = None
    init_cfg: Optional[Dict] = None

    @nn.compact
    def __call__(self, inputs, train: bool = False):
        assert len(inputs) == len(self.in_channels)
        feats = []
        for i, x in enumerate(inputs):
            # LN over the channel dim == token-sequence LayerNorm
            x = nn.LayerNorm(epsilon=1e-6, name=f'ln{i}')(x)
            x = ConvModule(self.in_channels[i], self.out_channels, 1,
                           norm_cfg=self.norm_cfg, act_cfg=self.act_cfg,
                           name=f'proj{i}')(x, train=train)
            feats.append(x)
        # top-down accumulation: [p5, p5+p4, p5+p4+p3, ...] reversed back
        mids = []
        for feat in feats[::-1]:
            mids.append(feat if not mids else mids[-1] + feat)
        outs = []
        for i, mid in enumerate(mids):
            outs.append(ConvModule(self.out_channels, self.out_channels, 3,
                                   padding=1, norm_cfg=self.norm_cfg,
                                   act_cfg=self.act_cfg,
                                   name=f'out{i}')(mid, train=train))
        return tuple(outs)


@MODELS.register_module()
class Feature2Pyramid(nn.Module):
    """Plain-ViT feature pyramid (reference ``necks/featurepyramid.py``):
    per-level rescale ops — 4x: deconv+norm+GELU+deconv; 2x: deconv;
    1: identity; 0.5/0.25: max-pool."""
    embed_dim: int = 768
    rescales: Sequence[float] = (4, 2, 1, 0.5)
    norm_cfg: Optional[Dict] = None
    init_cfg: Optional[Dict] = None

    @nn.compact
    def __call__(self, inputs, train: bool = False):
        from lednet_tpu.models.layers import Norm2d
        from lednet_tpu.ops.pool import max_pool2d
        assert len(inputs) == len(self.rescales)
        outs = []
        for i, k in enumerate(self.rescales):
            x = inputs[i]
            if k == 4:
                x = nn.ConvTranspose(self.embed_dim, (2, 2), strides=(2, 2),
                                     name=f'up4a_{i}')(x)
                x = Norm2d(self.norm_cfg or dict(type='SyncBN'),
                           name=f'up4n_{i}')(x, train=train)
                x = nn.gelu(x, approximate=False)
                x = nn.ConvTranspose(self.embed_dim, (2, 2), strides=(2, 2),
                                     name=f'up4b_{i}')(x)
            elif k == 2:
                x = nn.ConvTranspose(self.embed_dim, (2, 2), strides=(2, 2),
                                     name=f'up2_{i}')(x)
            elif k == 1:
                pass
            elif k == 0.5:
                x = max_pool2d(x, 2, 2)
            elif k == 0.25:
                x = max_pool2d(x, 4, 4)
            else:
                raise KeyError(f'invalid rescale {k} for Feature2Pyramid')
            outs.append(x)
        return tuple(outs)
