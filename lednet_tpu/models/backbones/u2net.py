"""U^2-Net: nested-U salient/binary segmentation network.

Behavioral spec: reference ``mmseg/models/backbones/u2net.py`` (an
unregistered plain nn.Module upstream — registered here so configs can use
it): RSU-L blocks are small U-Nets (L conv levels, ceil-mode 2x2 max pools,
dilated bottom conv, skip concats, residual to the input projection);
RSU4F replaces pooling with dilations 1/2/4/8. The full net stacks
RSU7..RSU4+RSU4F(x2) encoder / mirrored decoder, emits 6 side logits
upsampled to full resolution and a fused 1x1 over their concat; forward
returns sigmoid(d0..d6) exactly like the reference (``u2net.py:419-421``).

TPU notes: everything is 3x3 convs + bilinear resizes in NHWC — pure
MXU/XLA-fused work; the generic RSU keeps python control flow static.
"""
from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from lednet_tpu.models.layers import BatchNorm, kaiming_init
from lednet_tpu.ops.resize import resize_bilinear
from lednet_tpu.registry import MODELS


class REBNCONV(nn.Module):
    """conv3x3(dilated) + BN + ReLU (reference ``u2net.py:6-19``)."""
    out_channels: int
    dirate: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        d = self.dirate
        x = nn.Conv(self.out_channels, (3, 3), padding=((d, d), (d, d)),
                    kernel_dilation=(d, d), use_bias=True,
                    kernel_init=kaiming_init, name='conv')(x)
        x = BatchNorm(use_running_average=not train, momentum=0.9,
                      name='bn')(x)
        return nn.relu(x)


def _ceil_max_pool(x):
    """2x2 stride-2 max pool with torch ceil_mode=True semantics."""
    h, w = x.shape[1], x.shape[2]
    pad_h, pad_w = h % 2, w % 2
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1),
        ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))


class RSU(nn.Module):
    """Generic RSU-L (reference RSU7/6/5/4, ``u2net.py:30-280``)."""
    height: int  # number of conv levels (7 for RSU7 ... 4 for RSU4)
    mid_channels: int
    out_channels: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        L = self.height
        hxin = REBNCONV(self.out_channels, 1, name='rebnconvin')(x, train=train)

        enc = []
        h = hxin
        for i in range(1, L):
            h = REBNCONV(self.mid_channels, 1, name=f'rebnconv{i}')(h, train=train)
            enc.append(h)
            if i < L - 1:
                h = _ceil_max_pool(h)
        bottom = REBNCONV(self.mid_channels, 2, name=f'rebnconv{L}')(
            enc[-1], train=train)

        d = bottom
        for i in range(L - 1, 0, -1):
            ch = self.out_channels if i == 1 else self.mid_channels
            d = REBNCONV(ch, 1, name=f'rebnconv{i}d')(
                jnp.concatenate([d, enc[i - 1]], axis=-1), train=train)
            if i > 1:
                d = resize_bilinear(d, enc[i - 2].shape[1:3], False)
        return d + hxin


class RSU4F(nn.Module):
    """Dilation-pyramid RSU (no pooling; reference ``u2net.py:282-316``)."""
    mid_channels: int
    out_channels: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        hxin = REBNCONV(self.out_channels, 1, name='rebnconvin')(x, train=train)
        h1 = REBNCONV(self.mid_channels, 1, name='rebnconv1')(hxin, train=train)
        h2 = REBNCONV(self.mid_channels, 2, name='rebnconv2')(h1, train=train)
        h3 = REBNCONV(self.mid_channels, 4, name='rebnconv3')(h2, train=train)
        h4 = REBNCONV(self.mid_channels, 8, name='rebnconv4')(h3, train=train)
        d3 = REBNCONV(self.mid_channels, 4, name='rebnconv3d')(
            jnp.concatenate([h4, h3], axis=-1), train=train)
        d2 = REBNCONV(self.mid_channels, 2, name='rebnconv2d')(
            jnp.concatenate([d3, h2], axis=-1), train=train)
        d1 = REBNCONV(self.out_channels, 1, name='rebnconv1d')(
            jnp.concatenate([d2, h1], axis=-1), train=train)
        return d1 + hxin


# (stage type, height, mid, out) per encoder stage; decoder mirrors it
_FULL = dict(stages=((7, 32, 64), (6, 32, 128), (5, 64, 256), (4, 128, 512),
                     ('F', 256, 512), ('F', 256, 512)),
             dec=((('F', 256, 512)), ((4, 128, 256)), ((5, 64, 128)),
                  ((6, 32, 64)), ((7, 16, 64))))
_SMALL = dict(stages=((7, 16, 64), (6, 16, 64), (5, 16, 64), (4, 16, 64),
                      ('F', 16, 64), ('F', 16, 64)),
              dec=((('F', 16, 64)), ((4, 16, 64)), ((5, 16, 64)),
                   ((6, 16, 64)), ((7, 16, 64))))


def _make_stage(spec, name):
    kind, mid, out = spec
    if kind == 'F':
        return RSU4F(mid, out, name=name)
    return RSU(kind, mid, out, name=name)


@MODELS.register_module()
class U2Net(nn.Module):
    """Full U^2-Net (``small=True`` gives U2NETP). Returns the reference's
    7-tuple ``(sigmoid(d0), sigmoid(d1..d6))``."""
    in_channels: int = 3
    out_channels: int = 1
    small: bool = False
    init_cfg: Optional[dict] = None

    @nn.compact
    def __call__(self, x, train: bool = False) -> Tuple:
        cfg = _SMALL if self.small else _FULL
        specs = cfg['stages']

        feats = []
        h = x
        for i, spec in enumerate(specs):
            h = _make_stage(spec, f'stage{i + 1}')(h, train=train)
            feats.append(h)
            if i < len(specs) - 1:
                h = _ceil_max_pool(h)

        # decoder: stage5d..stage1d with skip concats
        dec_feats = [feats[-1]]  # hx6
        d = resize_bilinear(feats[-1], feats[-2].shape[1:3], False)
        for j, spec in enumerate(cfg['dec']):
            skip = feats[len(specs) - 2 - j]
            d = _make_stage(spec, f'stage{len(specs) - 1 - j}d')(
                jnp.concatenate([d, skip], axis=-1), train=train)
            dec_feats.insert(0, d)
            if j < len(cfg['dec']) - 1:
                d = resize_bilinear(d, feats[len(specs) - 3 - j].shape[1:3],
                                    False)

        size = dec_feats[0].shape[1:3]
        sides = []
        for i, f in enumerate(dec_feats):
            s = nn.Conv(self.out_channels, (3, 3), padding=1, use_bias=True,
                        kernel_init=kaiming_init, name=f'side{i + 1}')(f)
            if s.shape[1:3] != size:
                s = resize_bilinear(s, size, False)
            sides.append(s)
        d0 = nn.Conv(self.out_channels, (1, 1), use_bias=True,
                     kernel_init=kaiming_init, name='outconv')(
            jnp.concatenate(sides, axis=-1))
        return tuple(nn.sigmoid(v) for v in [d0] + sides)
