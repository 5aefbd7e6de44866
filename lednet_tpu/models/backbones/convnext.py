"""ConvNeXt and PoolFormer backbones.

Behavioral spec: the reference consumes these from mmpretrain in its config
corpus (``configs/_base_/models/upernet_convnext.py`` names
``mmpretrain.ConvNeXt``; ``configs/_base_/models/fpn_poolformer_s12.py``
names ``mmpretrain.PoolFormer``); the classes themselves live outside the
reference snapshot, so these are native re-implementations of the published
architectures (ConvNeXt: Liu et al. 2022; PoolFormer/MetaFormer: Yu et al.
2022) with mmpretrain's ctor surface. Registered under both the bare names
and the ``mmpretrain.``/``mmcls.`` scoped aliases so the reference config
fragments load unchanged.
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import flax.linen as nn

from lednet_tpu.models.layers import DropPath, drop_path_rates
from lednet_tpu.ops.pool import avg_pool2d
from lednet_tpu.registry import MODELS

# mmpretrain arch tables.
CONVNEXT_ARCH = {
    'tiny': dict(depths=(3, 3, 9, 3), channels=(96, 192, 384, 768)),
    'small': dict(depths=(3, 3, 27, 3), channels=(96, 192, 384, 768)),
    'base': dict(depths=(3, 3, 27, 3), channels=(128, 256, 512, 1024)),
    'large': dict(depths=(3, 3, 27, 3), channels=(192, 384, 768, 1536)),
    'xlarge': dict(depths=(3, 3, 27, 3), channels=(256, 512, 1024, 2048)),
}
POOLFORMER_ARCH = {
    's12': dict(layers=(2, 2, 6, 2), embed_dims=(64, 128, 320, 512)),
    's24': dict(layers=(4, 4, 12, 4), embed_dims=(64, 128, 320, 512)),
    's36': dict(layers=(6, 6, 18, 6), embed_dims=(64, 128, 320, 512)),
    'm36': dict(layers=(6, 6, 18, 6), embed_dims=(96, 192, 384, 768)),
    'm48': dict(layers=(8, 8, 24, 8), embed_dims=(96, 192, 384, 768)),
}


class _LayerScale(nn.Module):
    """Per-channel learnable residual scaling (gamma init ~1e-6/1e-5)."""
    dim: int
    init_value: float

    @nn.compact
    def __call__(self, x):
        gamma = self.param('gamma', nn.initializers.constant(self.init_value),
                           (self.dim,))
        return x * gamma


class _ConvNeXtBlock(nn.Module):
    dim: int
    layer_scale_init_value: float
    drop_path: float = 0.0

    @nn.compact
    def __call__(self, x, train: bool = False):
        shortcut = x
        x = nn.Conv(self.dim, (7, 7), padding=((3, 3), (3, 3)),
                    feature_group_count=self.dim, name='dwconv')(x)
        x = nn.LayerNorm(epsilon=1e-6, name='norm')(x)
        x = nn.Dense(4 * self.dim, name='pwconv1')(x)
        x = nn.gelu(x, approximate=False)
        x = nn.Dense(self.dim, name='pwconv2')(x)
        if self.layer_scale_init_value > 0:
            x = _LayerScale(self.dim, self.layer_scale_init_value,
                            name='ls')(x)
        return shortcut + DropPath(self.drop_path)(x, train=train)


@MODELS.register_module()
class ConvNeXt(nn.Module):
    """ConvNeXt feature extractor (mmpretrain ctor surface).

    Stem = 4x4/s4 conv + LN; stage transition = LN + 2x2/s2 conv; block =
    7x7 depthwise -> LN -> 4x MLP (GELU) -> layer scale -> residual. Each
    ``out_indices`` feature map gets its own LayerNorm, matching
    mmpretrain's dense-prediction output path (gap_before_final_norm=False).
    """
    arch: Any = 'tiny'
    in_channels: int = 3
    out_indices: Sequence[int] = (0, 1, 2, 3)
    drop_path_rate: float = 0.0
    layer_scale_init_value: float = 1e-6
    gap_before_final_norm: bool = False
    frozen_stages: int = 0
    pretrained: Optional[str] = None
    init_cfg: Optional[Dict] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        arch = (CONVNEXT_ARCH[self.arch] if isinstance(self.arch, str)
                else dict(self.arch))
        depths, channels = arch['depths'], arch['channels']
        outs = []
        dpr = drop_path_rates(self.drop_path_rate, depths)
        done = 0
        for s, (depth, dim) in enumerate(zip(depths, channels)):
            if s == 0:
                x = nn.Conv(dim, (4, 4), strides=(4, 4), padding='VALID',
                            name='stem_conv')(x)
                x = nn.LayerNorm(epsilon=1e-6, name='stem_norm')(x)
            else:
                x = nn.LayerNorm(epsilon=1e-6, name=f'down{s}_norm')(x)
                x = nn.Conv(dim, (2, 2), strides=(2, 2), padding='VALID',
                            name=f'down{s}_conv')(x)
            for b in range(depth):
                x = _ConvNeXtBlock(dim, self.layer_scale_init_value,
                                   drop_path=dpr[done],
                                   name=f's{s}_b{b}')(x, train=train)
                done += 1
            if s in self.out_indices:
                outs.append(nn.LayerNorm(epsilon=1e-6, name=f'out_norm{s}')(x))
        return tuple(outs)


class _PoolFormerBlock(nn.Module):
    dim: int
    mlp_ratio: int = 4
    layer_scale_init_value: float = 1e-5
    drop_path: float = 0.0

    @nn.compact
    def __call__(self, x, train: bool = False):
        # torch GroupNorm default eps (PoolFormer uses GroupNorm(1, dim))
        h = nn.GroupNorm(num_groups=1, epsilon=1e-5, name='norm1')(x)
        # token mixing: pooling minus identity (torch AvgPool2d(3, 1, 1,
        # count_include_pad=False))
        h = avg_pool2d(h, 3, 1, 1, count_include_pad=False) - h
        h = _LayerScale(self.dim, self.layer_scale_init_value, name='ls1')(h)
        x = x + DropPath(self.drop_path)(h, train=train)
        h = nn.GroupNorm(num_groups=1, epsilon=1e-5, name='norm2')(x)
        h = nn.Conv(self.dim * self.mlp_ratio, (1, 1), name='fc1')(h)
        h = nn.gelu(h, approximate=False)
        h = nn.Conv(self.dim, (1, 1), name='fc2')(h)
        h = _LayerScale(self.dim, self.layer_scale_init_value, name='ls2')(h)
        return x + DropPath(self.drop_path)(h, train=train)


@MODELS.register_module()
class PoolFormer(nn.Module):
    """PoolFormer feature extractor (mmpretrain ctor surface).

    The network list interleaves [stage0, down0, stage1, down1, ...], so
    mmpretrain's ``out_indices=(0, 2, 4, 6)`` selects the four stage
    outputs; we honour that indexing.
    """
    arch: Any = 's12'
    in_channels: int = 3
    in_patch_size: int = 7
    in_stride: int = 4
    in_pad: int = 2
    down_patch_size: int = 3
    down_stride: int = 2
    down_pad: int = 1
    mlp_ratio: int = 4
    layer_scale_init_value: float = 1e-5
    drop_rate: float = 0.0
    drop_path_rate: float = 0.0
    out_indices: Sequence[int] = (0, 2, 4, 6)
    frozen_stages: int = 0
    pretrained: Optional[str] = None
    init_cfg: Optional[Dict] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        arch = (POOLFORMER_ARCH[self.arch] if isinstance(self.arch, str)
                else dict(self.arch))
        layers, dims = arch['layers'], arch['embed_dims']
        outs = []
        net_idx = 0
        dpr = drop_path_rates(self.drop_path_rate, layers)
        done = 0
        for s, (depth, dim) in enumerate(zip(layers, dims)):
            if s == 0:
                p, st, pad = self.in_patch_size, self.in_stride, self.in_pad
            else:
                p, st, pad = (self.down_patch_size, self.down_stride,
                              self.down_pad)
            x = nn.Conv(dim, (p, p), strides=(st, st),
                        padding=((pad, pad), (pad, pad)),
                        name=f'patch_embed{s}')(x)
            for b in range(depth):
                x = _PoolFormerBlock(dim, self.mlp_ratio,
                                     self.layer_scale_init_value,
                                     drop_path=dpr[done],
                                     name=f's{s}_b{b}')(x, train=train)
                done += 1
            if net_idx in self.out_indices:
                outs.append(x)
            net_idx += 2  # stage then (virtual) downsample slot
        return tuple(outs)


# Scoped aliases so the reference's mmpretrain/mmcls-style type strings load.
for _scope in ('mmpretrain', 'mmcls'):
    MODELS.register_module(name=f'{_scope}.ConvNeXt', module=ConvNeXt)
    MODELS.register_module(name=f'{_scope}.PoolFormer', module=PoolFormer)
