"""DSNet (fork-added dual-branch model) and its MFACB/SPASPP blocks.

Behavioral spec: reference ``mmseg/models/backbones/dsnet.py:15-209`` — NOTE
the reference file is BROKEN in-repo (it imports from the withheld
``model_utils.py``); block semantics are recovered from the author's speed
rig ``tools/speed/model_utils_speed.py`` (MFACB ``:36-66``, SPASPP ``:68-``,
segmenthead ``:203-...``):

- MFACB: cascade of three dilated 3x3 convs whose taps concat -> 1x1, plus a
  1x1 projected residual (STDC-inspired fast receptive-field growth),
- SPASPP: serial-ASPP — four chained dilated convs (6/12/18/24) + image
  pooling, concat -> 1x1 + projected residual -> 3x3,
- DSNet: detail branch (BasicBlocks at 1/8) and semantic branch (MFACB
  stages at 1/8 with growing dilation) fused three times via Muti_AFF;
  embeds its own segment heads and returns (aux_p, main, aux_d) logits.

Divergence note: the speed-rig blocks have their BatchNorms commented out
(latency-rig artifact); we keep the norms so the model is trainable.
"""
from __future__ import annotations

from typing import Dict, Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp

from lednet_tpu.models.aff import MutiAFF
from lednet_tpu.models.layers import BasicBlock, Bottleneck, ConvModule
from lednet_tpu.ops import global_avg_pool
from lednet_tpu.ops.resize import resize_bilinear
from lednet_tpu.registry import MODELS

_BN = dict(type='BN')
_RELU = dict(type='ReLU')


class MFACB(nn.Module):
    """Multi-rate dilated cascade block."""
    in_planes: int
    inter_planes: int
    out_planes: int
    stride_1: int = 1
    dilation: Sequence[int] = (2, 2, 2)

    @nn.compact
    def __call__(self, x, train: bool = False):
        taps = []
        h = x
        for i, d in enumerate(self.dilation):
            h = ConvModule(self.in_planes if i == 0 else self.inter_planes,
                           self.inter_planes, 3,
                           stride=self.stride_1 if i == 0 else 1,
                           padding=d, dilation=d, norm_cfg=_BN, act_cfg=_RELU,
                           name=f'conv{i}')(h, train=train)
            taps.append(h)
        res = ConvModule(self.in_planes, self.out_planes, 1,
                         stride=self.stride_1, norm_cfg=_BN, act_cfg=_RELU,
                         name='process1')(x, train=train)
        out = ConvModule(self.inter_planes * len(self.dilation),
                         self.out_planes, 1, norm_cfg=_BN, act_cfg=_RELU,
                         name='process2')(jnp.concatenate(taps, -1),
                                          train=train)
        return out + res


class SPASPP(nn.Module):
    """Serial ASPP with large dilations + global pooling."""
    in_planes: int
    inter_planes: int
    out_planes: int
    dilation: Sequence[int] = (6, 12, 18, 24)

    @nn.compact
    def __call__(self, x, train: bool = False):
        taps = []
        h = x
        for i, d in enumerate(self.dilation):
            h = ConvModule(self.in_planes if i == 0 else self.inter_planes,
                           self.inter_planes, 3, padding=d, dilation=d,
                           norm_cfg=_BN, act_cfg=_RELU,
                           name=f'conv{i}')(h, train=train)
            taps.append(h)
        pool = ConvModule(self.in_planes, self.inter_planes, 1, norm_cfg=_BN,
                          act_cfg=_RELU,
                          name='pooling')(global_avg_pool(x), train=train)
        pool = resize_bilinear(pool, x.shape[-3:-1], False)
        res = ConvModule(self.in_planes, self.out_planes, 1, norm_cfg=_BN,
                         act_cfg=_RELU, name='process1')(x, train=train)
        out = ConvModule(self.inter_planes * 5, self.out_planes, 1,
                         norm_cfg=_BN, act_cfg=_RELU, name='process2')(
            jnp.concatenate(taps + [pool], -1), train=train)
        return ConvModule(self.out_planes, self.out_planes, 3, padding=1,
                          norm_cfg=_BN, act_cfg=_RELU,
                          name='process3')(out + res, train=train)


class _SegHead(nn.Module):
    inplanes: int
    interplanes: int
    outplanes: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = ConvModule(self.inplanes, self.interplanes, 3, padding=1,
                       norm_cfg=_BN, act_cfg=None,
                       order=('norm', 'act', 'conv'),
                       name='conv1')(nn.relu(x), train=train)
        return nn.Conv(self.outplanes, (1, 1), use_bias=True,
                       name='conv2')(nn.relu(h))


@MODELS.register_module()
class DSNet(nn.Module):
    """Standalone dual-branch segmenter (embeds its heads, like the
    reference)."""
    m: int = 2
    n: int = 3
    num_classes: int = 19
    planes: int = 64
    name_variant: str = 's128'
    augment: bool = True
    init_cfg: Optional[Dict] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        p = self.planes
        H, W = x.shape[1], x.shape[2]

        h = ConvModule(3, p, 3, stride=2, padding=1, norm_cfg=_BN,
                       act_cfg=_RELU, name='conv1a')(x, train=train)
        h = ConvModule(p, p, 3, stride=2, padding=1, norm_cfg=_BN,
                       act_cfg=_RELU, name='conv1b')(h, train=train)
        h1 = h
        for i in range(self.m):
            h1 = BasicBlock(p, p, norm_cfg=_BN, act_out=(i < self.m - 1),
                            name=f'layer1_{i}')(h1, train=train)
        x_a = BasicBlock(p, p, norm_cfg=_BN, act_out=False,
                         name='layer1_a')(h1, train=train)       # 1/4 tap
        h2 = nn.relu(h1)
        for i in range(self.m):
            h2 = BasicBlock(p if i == 0 else 2 * p, 2 * p,
                            stride=2 if i == 0 else 1, downsample=(i == 0),
                            norm_cfg=_BN, act_out=(i < self.m - 1),
                            name=f'layer2_{i}')(h2, train=train)
        h2 = nn.relu(h2)                                          # 2p @ 1/8

        # semantic branch (dilated, stays 1/8)
        s = MFACB(2 * p, 2 * p, 4 * p, name='layer3_0')(h2, train=train)
        s = MFACB(4 * p, 4 * p, 4 * p, name='layer3_1')(s, train=train)
        s = MFACB(4 * p, 4 * p, 4 * p, dilation=(3, 3, 3),
                  name='layer3_2')(s, train=train)
        # detail branch
        d = h2
        for i in range(self.n):
            d = BasicBlock(2 * p if i == 0 else 4 * p, 4 * p,
                           downsample=(i == 0), norm_cfg=_BN,
                           act_out=(i < self.n - 1),
                           name=f'layer3__{i}')(d, train=train)
        d = MutiAFF(4 * p, name='aff1')(
            d, ConvModule(4 * p, 4 * p, 1, norm_cfg=_BN, act_cfg=None,
                          name='compression3')(s, train=train), train=train)
        temp_1 = d

        s = MFACB(4 * p, 4 * p, 8 * p, dilation=(3, 3, 3),
                  name='layer4_0')(s, train=train)
        s = MFACB(8 * p, 8 * p, 8 * p, dilation=(5, 5, 5),
                  name='layer4_1')(s, train=train)
        d2 = nn.relu(d)
        for i in range(self.n):
            d2 = BasicBlock(4 * p, 4 * p, norm_cfg=_BN,
                            act_out=(i < self.n - 1),
                            name=f'layer4__{i}')(d2, train=train)
        d = MutiAFF(4 * p, name='aff2')(
            d2, ConvModule(8 * p, 4 * p, 1, norm_cfg=_BN, act_cfg=None,
                           name='compression4')(s, train=train), train=train)
        temp_2 = d

        d = Bottleneck(4 * p, 2 * p, downsample=False, norm_cfg=_BN,
                       act_out=False, name='layer5_')(nn.relu(d), train=train)
        s = Bottleneck(8 * p, 4 * p, stride=1, downsample=False, norm_cfg=_BN,
                       act_out=False, name='layer5')(s, train=train)
        s = nn.relu(s)
        d = MutiAFF(4 * p, name='aff3')(
            d, ConvModule(8 * p, 4 * p, 1, norm_cfg=_BN, act_cfg=None,
                          name='compression5')(s, train=train), train=train)
        d = nn.relu(d)
        d = SPASPP(4 * p, 4 * p, 4 * p, name='spp')(d, train=train)
        d = ConvModule(4 * p, 4 * p, 3, padding=1, norm_cfg=_BN, act_cfg=None,
                       name='up8')(d, train=train)
        d = resize_bilinear(d, (d.shape[1] * 2, d.shape[2] * 2), False)
        d = jnp.concatenate([d, x_a], axis=-1)
        main = _SegHead(5 * p, 4 * p, self.num_classes,
                        name='lastlayer')(d, train=train)
        main = resize_bilinear(main, (H, W), False)
        if not self.augment:
            return main
        aux_p = _SegHead(4 * p, 4 * p, self.num_classes,
                         name='seghead_p')(temp_1, train=train)
        aux_d = _SegHead(4 * p, p, self.num_classes,
                         name='seghead_d')(temp_2, train=train)
        aux_p = resize_bilinear(aux_p, (H, W), False)
        aux_d = resize_bilinear(aux_d, (H, W), False)
        return aux_p, main, aux_d
