"""GETB — Global-Efficient Transformer Block (windowed attention).

Behavioral spec from the reference ``mmseg/models/backbones/UNetFormer_GETB.py``
(classes ``GlobalLocalAttention:97`` and ``GETBBlock:209``; the speed rig
instantiates them at dims 128/256/128, heads=8, window 8 —
``tools/speed/ddrnet_speed.py:81-83``):

- pre-norm (BatchNorm2d) residual block: ``x + attn(norm(x))`` then
  ``x + mlp(norm(x))`` with a ReLU6 conv-MLP,
- attention: reflect-pad H/W to multiples of the window, 1x1-conv qkv,
  non-overlapping ws x ws window softmax attention with a learned relative
  position bias, crop back, then add axial average-pool context paths
  (``attn_x``/``attn_y``: kernel (ws,1)/(1,ws), stride 1, asymmetric reflect
  pad) and the identity 'local' path, project with a separable conv (kernel =
  window size) after a (0,1,0,1) reflect pad, crop to H x W.

TPU notes: window partition is pure reshape/transpose; the per-window
attention is a batched (B*nWin, heads, 64, 64) matmul that XLA tiles onto the
MXU. Window size 8 -> 64 tokens, so attention cost is linear in pixels.
"""
from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from lednet_tpu.models.layers import Norm2d, kaiming_init
from lednet_tpu.ops import avg_pool2d
from lednet_tpu.ops.resize import resize_bilinear


def _relative_position_index(ws: int) -> np.ndarray:
    """Static (ws*ws, ws*ws) index into the (2ws-1)^2 bias table."""
    coords = np.stack(np.meshgrid(np.arange(ws), np.arange(ws), indexing='ij'))
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]
    rel = rel.transpose(1, 2, 0)
    rel[:, :, 0] += ws - 1
    rel[:, :, 1] += ws - 1
    rel[:, :, 0] *= 2 * ws - 1
    return rel.sum(-1)


def _reflect_pad(x, pad_h, pad_w):
    """Reflect-pad bottom/right of an NHWC tensor."""
    if pad_h == 0 and pad_w == 0:
        return x
    return jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)), mode='reflect')


class GlobalLocalAttention(nn.Module):
    dim: int
    num_heads: int = 16
    window_size: int = 8
    qkv_bias: bool = False
    relative_pos_embedding: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        B, H, W, C = x.shape
        ws = self.window_size
        head_dim = C // self.num_heads
        scale = head_dim ** -0.5

        local = x
        pad_h = (-H) % ws
        pad_w = (-W) % ws
        xp = _reflect_pad(x, pad_h, pad_w)
        Hp, Wp = H + pad_h, W + pad_w
        nh, nw = Hp // ws, Wp // ws

        qkv = nn.Conv(3 * C, (1, 1), use_bias=self.qkv_bias,
                      kernel_init=kaiming_init, name='qkv')(xp)
        # (B,Hp,Wp,3C) -> (3, B*nh*nw, heads, ws*ws, d)
        qkv = qkv.reshape(B, nh, ws, nw, ws, 3, self.num_heads, head_dim)
        qkv = qkv.transpose(5, 0, 1, 3, 6, 2, 4, 7)
        qkv = qkv.reshape(3, B * nh * nw, self.num_heads, ws * ws, head_dim)
        q, k, v = qkv[0], qkv[1], qkv[2]

        dots = jnp.einsum('bhnd,bhmd->bhnm', q, k,
                          preferred_element_type=jnp.float32) * scale
        if self.relative_pos_embedding:
            table = self.param('relative_position_bias_table',
                               nn.initializers.truncated_normal(0.02),
                               ((2 * ws - 1) ** 2, self.num_heads), jnp.float32)
            idx = jnp.asarray(_relative_position_index(ws).reshape(-1))
            bias = jnp.take(table, idx, axis=0).reshape(ws * ws, ws * ws,
                                                        self.num_heads)
            dots = dots + bias.transpose(2, 0, 1)[None]
        attn = nn.softmax(dots, axis=-1).astype(v.dtype)
        out = jnp.einsum('bhnm,bhmd->bhnd', attn, v,
                         preferred_element_type=jnp.float32).astype(v.dtype)

        # back to (B, Hp, Wp, C), crop to H, W
        out = out.reshape(B, nh, nw, self.num_heads, ws, ws, head_dim)
        out = out.transpose(0, 1, 4, 2, 5, 3, 6).reshape(B, Hp, Wp, C)
        out = out[:, :H, :W, :]

        # axial pooled context: AvgPool((ws,1),s=1,p=(ws/2-1,0)) on bottom-
        # reflect-padded map, and the transpose for columns.
        ax = avg_pool2d(_reflect_pad(out, 1, 0), (ws, 1), (1, 1), (ws // 2 - 1, 0))
        ay = avg_pool2d(_reflect_pad(out, 0, 1), (1, ws), (1, 1), (0, ws // 2 - 1))
        out = ax + ay + local

        # separable-conv projection on (0,1,0,1)-reflect-padded map
        out = _reflect_pad(out, 1, 1)
        pad = ((ws - 1) // 2, (ws - 1) // 2)
        out = nn.Conv(C, (ws, ws), padding=(pad, pad), feature_group_count=C,
                      use_bias=False, kernel_init=kaiming_init,
                      name='proj_dw')(out)
        out = Norm2d(dict(type='BN'), name='proj_norm')(out, train=train)
        out = nn.Conv(C, (1, 1), use_bias=False, kernel_init=kaiming_init,
                      name='proj_pw')(out)
        return out[:, :H, :W, :]


class ConvMlp(nn.Module):
    """1x1-conv MLP with ReLU6 (reference ``UNetFormer_GETB.py:78-94``)."""
    dim: int
    hidden_dim: int
    drop: float = 0.0

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(self.hidden_dim, (1, 1), use_bias=True,
                    kernel_init=kaiming_init, name='fc1')(x)
        x = jnp.clip(x, 0, 6)
        if self.drop > 0 and train:
            x = nn.Dropout(self.drop, deterministic=not train)(x)
        x = nn.Conv(self.dim, (1, 1), use_bias=True,
                    kernel_init=kaiming_init, name='fc2')(x)
        if self.drop > 0 and train:
            x = nn.Dropout(self.drop, deterministic=not train)(x)
        return x


class WF(nn.Module):
    """Weighted fusion of a decoder feature with a skip (reference
    ``UNetFormer_GETB.py:229-244``): ``x`` is 2x bilinear-upsampled
    (``upsample=False`` gives the ``WF1:246-260`` variant without it),
    blended with ``pre_conv(res)`` by softly-normalized ReLU weights,
    then a 3x3 Conv-BN-ReLU6."""
    in_channels: int = 128
    decode_channels: int = 128
    eps: float = 1e-8
    upsample: bool = True

    @nn.compact
    def __call__(self, x, res, train: bool = False):
        if self.upsample:
            B, H, W, _ = x.shape
            x = resize_bilinear(x, (2 * H, 2 * W), align_corners=False)
        w = nn.relu(self.param('weights', nn.initializers.ones, (2,),
                               jnp.float32))
        fuse = w / (jnp.sum(w) + self.eps)
        res = nn.Conv(self.decode_channels, (1, 1), use_bias=False,
                      kernel_init=kaiming_init, name='pre_conv')(res)
        x = fuse[0] * res + fuse[1] * x
        x = nn.Conv(self.decode_channels, (3, 3), padding=1, use_bias=False,
                    kernel_init=kaiming_init, name='post_conv')(x)
        x = Norm2d(dict(type='BN'), name='post_norm')(x, train=train)
        return jnp.clip(x, 0, 6)


class FeatureRefinementHead(nn.Module):
    """WF fusion followed by parallel pixel/channel attention and a
    separable-conv projection (reference ``UNetFormer_GETB.py:263-297``):
    ``pa`` = sigmoid of a biased depthwise 3x3, ``ca`` = squeeze-excite
    (C/16 bottleneck, ReLU6, bias-free 1x1s), ``out =
    relu6(sep_conv_bn(pa*x + ca*x) + conv_bn_1x1(x))``."""
    in_channels: int = 64
    decode_channels: int = 64
    eps: float = 1e-8

    @nn.compact
    def __call__(self, x, res, train: bool = False):
        c = self.decode_channels
        B, H, W, _ = x.shape
        x = resize_bilinear(x, (2 * H, 2 * W), align_corners=False)
        w = nn.relu(self.param('weights', nn.initializers.ones, (2,),
                               jnp.float32))
        fuse = w / (jnp.sum(w) + self.eps)
        res = nn.Conv(c, (1, 1), use_bias=False, kernel_init=kaiming_init,
                      name='pre_conv')(res)
        x = fuse[0] * res + fuse[1] * x
        x = nn.Conv(c, (3, 3), padding=1, use_bias=False,
                    kernel_init=kaiming_init, name='post_conv')(x)
        x = Norm2d(dict(type='BN'), name='post_norm')(x, train=train)
        x = jnp.clip(x, 0, 6)

        shortcut = nn.Conv(c, (1, 1), use_bias=False,
                           kernel_init=kaiming_init, name='shortcut_conv')(x)
        shortcut = Norm2d(dict(type='BN'),
                          name='shortcut_norm')(shortcut, train=train)
        pa = nn.sigmoid(nn.Conv(c, (3, 3), padding=1, feature_group_count=c,
                                use_bias=True, kernel_init=kaiming_init,
                                name='pa_conv')(x))
        gap = jnp.mean(x, axis=(1, 2), keepdims=True)
        ca = nn.Conv(max(c // 16, 1), (1, 1), use_bias=False,
                     kernel_init=kaiming_init, name='ca_fc1')(gap)
        ca = jnp.clip(ca, 0, 6)
        ca = nn.sigmoid(nn.Conv(c, (1, 1), use_bias=False,
                                kernel_init=kaiming_init, name='ca_fc2')(ca))
        x = pa * x + ca * x
        x = nn.Conv(c, (3, 3), padding=1, feature_group_count=c,
                    use_bias=False, kernel_init=kaiming_init,
                    name='proj_dw')(x)
        x = Norm2d(dict(type='BN'), name='proj_norm')(x, train=train)
        x = nn.Conv(c, (1, 1), use_bias=False, kernel_init=kaiming_init,
                    name='proj_pw')(x)
        return jnp.clip(x + shortcut, 0, 6)


class AuxHead(nn.Module):
    """Training-time auxiliary classifier (reference
    ``UNetFormer_GETB.py:300-313``): Conv-BN-ReLU6 -> dropout(0.1) ->
    bias-free 1x1 classifier -> bilinear resize to ``(h, w)``."""
    in_channels: int = 64
    num_classes: int = 8
    drop: float = 0.1

    @nn.compact
    def __call__(self, x, h: int, w: int, train: bool = False):
        x = nn.Conv(self.in_channels, (3, 3), padding=1, use_bias=False,
                    kernel_init=kaiming_init, name='conv')(x)
        x = Norm2d(dict(type='BN'), name='norm')(x, train=train)
        x = jnp.clip(x, 0, 6)
        x = nn.Dropout(self.drop, deterministic=not train)(x)
        x = nn.Conv(self.num_classes, (1, 1), use_bias=False,
                    kernel_init=kaiming_init, name='conv_out')(x)
        return resize_bilinear(x, (h, w), align_corners=False)


class GETBBlock(nn.Module):
    dim: int
    num_heads: int = 16
    mlp_ratio: float = 4.0
    window_size: int = 8
    qkv_bias: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = Norm2d(dict(type='BN'), name='norm1')(x, train=train)
        x = x + GlobalLocalAttention(self.dim, self.num_heads,
                                     self.window_size, self.qkv_bias,
                                     name='attn')(h, train=train)
        h = Norm2d(dict(type='BN'), name='norm2')(x, train=train)
        x = x + ConvMlp(self.dim, int(self.dim * self.mlp_ratio),
                        name='mlp')(h, train=train)
        return x
