"""HRNet backbone (parallel multi-resolution streams with repeated fusion).

Behavioral spec: reference ``mmseg/models/backbones/hrnet.py`` — stage1 is a
ResNet Bottleneck stem at 1/4; later stages hold 2/3/4 parallel branches at
1/4..1/32 built from BasicBlocks, ending each module with a full cross-
resolution fusion (1x1 conv + upsample for coarser->finer, strided 3x3 chains
for finer->coarser, summed then ReLU). Output: the multi-resolution tuple.
"""
from __future__ import annotations

from typing import Dict, Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp

from lednet_tpu.models.layers import BasicBlock, Bottleneck, ConvModule, Norm2d, kaiming_init
from lednet_tpu.ops.resize import resize_bilinear
from lednet_tpu.registry import MODELS


class _Fuse(nn.Module):
    """Cross-resolution fusion across parallel branches."""
    channels: Sequence[int]
    norm_cfg: Optional[Dict] = None

    @nn.compact
    def __call__(self, xs, train: bool = False):
        norm_cfg = self.norm_cfg or dict(type='BN')
        n = len(xs)
        outs = []
        for i in range(n):
            acc = None
            for j in range(n):
                y = xs[j]
                if j > i:      # coarser -> finer: 1x1 conv + upsample
                    y = ConvModule(self.channels[j], self.channels[i], 1,
                                   norm_cfg=norm_cfg, act_cfg=None,
                                   name=f'f{i}_{j}')(y, train=train)
                    y = resize_bilinear(y, xs[i].shape[-3:-1], False)
                elif j < i:    # finer -> coarser: chain of strided 3x3
                    # reference hrnet.py:157-186: intermediate convs stay at
                    # channels[j]; only the last maps to channels[i]
                    for k in range(i - j):
                        last = k == i - j - 1
                        y = ConvModule(
                            self.channels[j],
                            self.channels[i] if last else self.channels[j],
                            3, stride=2, padding=1,
                            norm_cfg=norm_cfg,
                            act_cfg=None if last else dict(type='ReLU'),
                            name=f'f{i}_{j}_{k}')(y, train=train)
                acc = y if acc is None else acc + y
            outs.append(nn.relu(acc))
        return outs


@MODELS.register_module()
class HRNet(nn.Module):
    extra: Dict
    in_channels: int = 3
    norm_cfg: Optional[Dict] = None
    norm_eval: bool = False
    with_cp: bool = False
    frozen_stages: int = -1
    zero_init_residual: bool = False
    multiscale_output: bool = True
    pretrained: Optional[str] = None
    init_cfg: Optional[Dict] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        norm_cfg = self.norm_cfg or dict(type='BN')
        extra = dict(self.extra)

        # stem to 1/4
        x = ConvModule(self.in_channels, 64, 3, stride=2, padding=1,
                       norm_cfg=norm_cfg, act_cfg=dict(type='ReLU'),
                       name='stem1')(x, train=train)
        x = ConvModule(64, 64, 3, stride=2, padding=1, norm_cfg=norm_cfg,
                       act_cfg=dict(type='ReLU'), name='stem2')(x, train=train)

        # stage 1: Bottleneck layer (reference uses the ResNet Bottleneck,
        # expansion 4 — hrnet.py:297,383: stage1_out = num_channels * 4)
        s1 = dict(extra['stage1'])
        blocks = s1['num_blocks'][0]
        ch = s1['num_channels'][0]
        h = x
        in_ch = 64
        for i in range(blocks):
            h = Bottleneck(in_ch, ch, downsample=(in_ch != ch * 4),
                           norm_cfg=norm_cfg, act_out=True, expansion=4,
                           name=f'layer1_{i}')(h, train=train)
            in_ch = ch * 4
        xs = [h]
        prev_channels = [in_ch]

        for stage_idx in (2, 3, 4):
            key = f'stage{stage_idx}'
            if key not in extra:
                break
            scfg = dict(extra[key])
            num_channels = list(scfg['num_channels'])
            # transition: adapt/extend branches
            new_xs = []
            for i, c in enumerate(num_channels):
                if i < len(xs):
                    if prev_channels[i] != c:
                        y = ConvModule(prev_channels[i], c, 3, padding=1,
                                       norm_cfg=norm_cfg,
                                       act_cfg=dict(type='ReLU'),
                                       name=f't{stage_idx}_{i}')(xs[i],
                                                                 train=train)
                    else:
                        y = xs[i]
                else:
                    y = ConvModule(prev_channels[-1], c, 3, stride=2,
                                   padding=1, norm_cfg=norm_cfg,
                                   act_cfg=dict(type='ReLU'),
                                   name=f't{stage_idx}_{i}')(xs[-1],
                                                             train=train)
                new_xs.append(y)
            xs = new_xs
            prev_channels = num_channels

            for m in range(scfg['num_modules']):
                # branch blocks
                branch_out = []
                for i, c in enumerate(num_channels):
                    h = xs[i]
                    for b in range(scfg['num_blocks'][i]):
                        h = BasicBlock(c, c, norm_cfg=norm_cfg, act_out=True,
                                       name=f's{stage_idx}_m{m}_b{i}_{b}')(
                            h, train=train)
                    branch_out.append(h)
                xs = _Fuse(num_channels, norm_cfg,
                           name=f's{stage_idx}_m{m}_fuse')(branch_out,
                                                           train=train)
        return tuple(xs)
