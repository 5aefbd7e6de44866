"""UNet backbone.

Behavioral spec: reference ``mmseg/models/backbones/unet.py`` — classic
encoder/decoder. Per stage: BasicConvBlock (first conv carries the stage
stride and always dilation 1; later convs carry the stage dilation,
``unet.py:61-74``), MaxPool 2x2 downsampling only when the stage stride is 1
(``unet.py:368-371``), decoder upsample per ``upsample_cfg`` — InterpConv
(bilinear x2 + conv, ``unet.py:149-221``) or DeconvModule (4x4/s2 deconv +
BN + act, ``unet.py:88-146``), or a plain 1x1 ConvModule when the encoder
stage did not downsample (``up_conv_block.py:79-89``) — then skip-concat +
conv block. Returns all decoder scales deepest-first.
"""
from __future__ import annotations

from typing import Dict, Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp

from lednet_tpu.models.layers import ConvModule, Norm2d, build_activation
from lednet_tpu.ops import max_pool2d
from lednet_tpu.ops.resize import resize_bilinear, resize_nearest
from lednet_tpu.registry import MODELS


class BasicConvBlock(nn.Module):
    """Stack of 3x3 convs; the first conv carries ``stride`` and is never
    dilated (reference ``unet.py:61-74``)."""
    in_channels: int
    out_channels: int
    num_convs: int = 2
    stride: int = 1
    dilation: int = 1
    norm_cfg: Optional[Dict] = None
    act_cfg: Optional[Dict] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        norm_cfg = self.norm_cfg or dict(type='BN')
        act_cfg = self.act_cfg or dict(type='ReLU')
        for i in range(self.num_convs):
            first = i == 0
            x = ConvModule(self.in_channels if first else self.out_channels,
                           self.out_channels, 3,
                           stride=self.stride if first else 1,
                           padding=1 if first else self.dilation,
                           dilation=1 if first else self.dilation,
                           norm_cfg=norm_cfg,
                           act_cfg=act_cfg, name=f'conv{i}')(x, train=train)
        return x


class DeconvModule(nn.Module):
    """4x4/s2 transposed-conv upsampler + norm + act (``unet.py:88-146``)."""
    in_channels: int
    out_channels: int
    kernel_size: int = 4
    scale_factor: int = 2
    norm_cfg: Optional[Dict] = None
    act_cfg: Optional[Dict] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        k, s = self.kernel_size, self.scale_factor
        assert k >= s and (k - s) % 2 == 0
        pad = (k - s) // 2
        # flax ConvTranspose with torch-equivalent geometry: torch's
        # output = (in-1)*s - 2*pad + k; flax padding arg is on the dilated
        # input, torch pad p maps to flax padding (k-1-p) on each side.
        x = nn.ConvTranspose(self.out_channels, (k, k), strides=(s, s),
                             padding=((k - 1 - pad, k - 1 - pad),
                                      (k - 1 - pad, k - 1 - pad)),
                             transpose_kernel=True, name='deconv')(x)
        x = Norm2d(self.norm_cfg or dict(type='BN'), name='norm')(x,
                                                                  train=train)
        return build_activation(self.act_cfg or dict(type='ReLU'),
                                self.out_channels, name='act')(x)


class InterpConv(nn.Module):
    """Interpolation upsample + conv (``unet.py:149-221``)."""
    in_channels: int
    out_channels: int
    conv_first: bool = False
    kernel_size: int = 1
    stride: int = 1
    padding: int = 0
    upsample_cfg: Optional[Dict] = None
    norm_cfg: Optional[Dict] = None
    act_cfg: Optional[Dict] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        up_cfg = dict(self.upsample_cfg or dict(
            scale_factor=2, mode='bilinear', align_corners=False))
        scale = up_cfg.get('scale_factor', 2)
        mode = up_cfg.get('mode', 'bilinear')
        align = bool(up_cfg.get('align_corners', False))
        conv = ConvModule(self.in_channels, self.out_channels,
                          self.kernel_size, stride=self.stride,
                          padding=self.padding,
                          norm_cfg=self.norm_cfg or dict(type='BN'),
                          act_cfg=self.act_cfg or dict(type='ReLU'),
                          name='conv')

        def upsample(h):
            size = (h.shape[-3] * scale, h.shape[-2] * scale)
            if mode == 'nearest':
                return resize_nearest(h, size)
            return resize_bilinear(h, size, align)

        if self.conv_first:
            return upsample(conv(x, train=train))
        return conv(upsample(x), train=train)


@MODELS.register_module()
class UNet(nn.Module):
    in_channels: int = 3
    base_channels: int = 64
    num_stages: int = 5
    strides: Sequence[int] = (1, 1, 1, 1, 1)
    enc_num_convs: Sequence[int] = (2, 2, 2, 2, 2)
    dec_num_convs: Sequence[int] = (2, 2, 2, 2)
    downsamples: Sequence[bool] = (True, True, True, True)
    enc_dilations: Sequence[int] = (1, 1, 1, 1, 1)
    dec_dilations: Sequence[int] = (1, 1, 1, 1)
    norm_cfg: Optional[Dict] = None
    act_cfg: Optional[Dict] = None
    upsample_cfg: Optional[Dict] = None
    norm_eval: bool = False
    pretrained: Optional[str] = None
    init_cfg: Optional[Dict] = None
    with_cp: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        up_type_cfg = dict(self.upsample_cfg or dict(type='InterpConv'))
        enc_outs = []
        in_ch = self.in_channels
        for i in range(self.num_stages):
            ch = self.base_channels * 2 ** i
            if i > 0 and self.strides[i] == 1 and self.downsamples[i - 1]:
                x = max_pool2d(x, 2, 2, 0)
            x = BasicConvBlock(in_ch, ch, self.enc_num_convs[i],
                               self.strides[i], self.enc_dilations[i],
                               self.norm_cfg, self.act_cfg,
                               name=f'enc{i}')(x, train=train)
            enc_outs.append(x)
            in_ch = ch

        dec_outs = [x]
        for i in range(self.num_stages - 2, -1, -1):
            skip = enc_outs[i]
            ch = self.base_channels * 2 ** i
            with_upsample = (self.strides[i + 1] != 1
                             or self.downsamples[i])
            if with_upsample:
                up_cfg = dict(up_type_cfg)
                up_type = up_cfg.pop('type', 'InterpConv')
                if up_type == 'DeconvModule':
                    up = DeconvModule(x.shape[-1], ch,
                                      norm_cfg=self.norm_cfg,
                                      act_cfg=self.act_cfg,
                                      name=f'up{i}', **up_cfg)(x, train=train)
                else:
                    up = InterpConv(x.shape[-1], ch, norm_cfg=self.norm_cfg,
                                    act_cfg=self.act_cfg,
                                    name=f'up{i}', **up_cfg)(x, train=train)
            else:
                up = ConvModule(x.shape[-1], ch, 1,
                                norm_cfg=self.norm_cfg or dict(type='BN'),
                                act_cfg=self.act_cfg or dict(type='ReLU'),
                                name=f'up{i}')(x, train=train)
            x = BasicConvBlock(2 * ch, ch, self.dec_num_convs[i], 1,
                               self.dec_dilations[i], self.norm_cfg,
                               self.act_cfg, name=f'dec{i}')(
                jnp.concatenate([skip, up], axis=-1), train=train)
            dec_outs.append(x)
        return tuple(dec_outs)
