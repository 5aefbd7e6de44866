"""Attentional feature fusion: AFF / Muti_AFF (MSAF) / iAFF.

Behavioral spec from the reference ``tools/speed/model_utils_speed.py:278-446``:

- AFF: ``wei = sigmoid(local_att(x+res) + global_att(x+res))``;
  ``out = 2*x*wei + 2*res*(1-wei)``. local = 1x1 bottleneck (BN+ReLU),
  global = GAP + 1x1 bottleneck.
- Muti_AFF (the LED-Net fusion, aka MSAF): adds three semantic-scale context
  paths — AdaptiveAvgPool to 4x4 / 8x8 / 16x16 + 1x1 bottleneck (no BN!) —
  nearest-upsampled back; ``wei = sigmoid(local + c4 + c8 + c16 + global)``.
- iAFF: two-round iterative AFF.

TPU note: the adaptive pools are exact torch-binned matmuls (ops/pool.py) and
everything else is 1x1 convs, i.e. pure MXU work fused by XLA.
"""
from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from lednet_tpu.models.layers import Norm2d, kaiming_init
from lednet_tpu.ops import adaptive_avg_pool2d, global_avg_pool
from lednet_tpu.ops.resize import resize_nearest


class _Bottleneck1x1(nn.Module):
    """1x1 conv -> [BN] -> ReLU -> 1x1 conv -> [BN]."""
    channels: int
    inter_channels: int
    with_bn: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(self.inter_channels, (1, 1), use_bias=True,
                    kernel_init=kaiming_init, name='conv1')(x)
        if self.with_bn:
            x = Norm2d(dict(type='BN'), name='norm1')(x, train=train)
        x = nn.relu(x)
        x = nn.Conv(self.channels, (1, 1), use_bias=True,
                    kernel_init=kaiming_init, name='conv2')(x)
        if self.with_bn:
            x = Norm2d(dict(type='BN'), name='norm2')(x, train=train)
        return x


class AFF(nn.Module):
    channels: int
    r: int = 4

    @nn.compact
    def __call__(self, x, residual, train: bool = False):
        inter = self.channels // self.r
        xa = x + residual
        xl = _Bottleneck1x1(self.channels, inter, name='local_att')(xa, train=train)
        xg = _Bottleneck1x1(self.channels, inter, name='global_att')(
            global_avg_pool(xa), train=train)
        wei = nn.sigmoid(xl + xg)
        return 2 * x * wei + 2 * residual * (1 - wei)


class MutiAFF(nn.Module):
    """Multi-scale attentional fusion used at both LED-Net bilateral fusions
    (``ddrnet_speed.py:361,387``)."""
    channels: int
    r: int = 4

    @nn.compact
    def __call__(self, x, residual, train: bool = False):
        inter = self.channels // self.r
        h, w = x.shape[-3], x.shape[-2]
        xa = x + residual
        xl = _Bottleneck1x1(self.channels, inter, with_bn=False,
                            name='local_att')(xa, train=train)
        terms = [xl]
        for size in (4, 8, 16):
            c = _Bottleneck1x1(self.channels, inter, with_bn=False,
                               name=f'context{size}')(
                adaptive_avg_pool2d(xa, size), train=train)
            terms.append(resize_nearest(c, (h, w)))
        terms.append(_Bottleneck1x1(self.channels, inter, with_bn=False,
                                    name='global_att')(global_avg_pool(xa),
                                                       train=train))
        wei = nn.sigmoid(sum(terms))
        return 2 * x * wei + 2 * residual * (1 - wei)


class IAFF(nn.Module):
    """Iterative AFF (two attention rounds; reference ``:391-446``).

    Round 2 reuses the *global* bottleneck of round 1 (the reference calls
    ``self.global_att`` twice — reproduced deliberately)."""
    channels: int
    r: int = 4

    @nn.compact
    def __call__(self, x, residual, train: bool = False):
        inter = self.channels // self.r
        global_att = _Bottleneck1x1(self.channels, inter, name='global_att')
        xa = x + residual
        xl = _Bottleneck1x1(self.channels, inter, name='local_att')(xa, train=train)
        xg = global_att(global_avg_pool(xa), train=train)
        wei = nn.sigmoid(xl + xg)
        xi = x * wei + residual * (1 - wei)
        xl2 = _Bottleneck1x1(self.channels, inter, name='local_att2')(xi, train=train)
        xg2 = global_att(global_avg_pool(xi), train=train)
        wei2 = nn.sigmoid(xl2 + xg2)
        return x * wei2 + residual * (1 - wei2)
