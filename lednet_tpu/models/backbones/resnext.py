"""ResNeXt / ResNeSt-lite backbones.

Behavioral specs: reference ``mmseg/models/backbones/resnext.py`` (grouped
3x3 bottleneck with ``groups``/``base_width``) and ``resnest.py``
(split-attention bottleneck; implemented here with radix-2 split attention,
the configuration every in-tree resnest config uses).
"""
from __future__ import annotations

from typing import Dict, Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp

from lednet_tpu.models.backbones.resnet import ResNet, _ResBottleneck
from lednet_tpu.models.layers import ConvModule, Norm2d, kaiming_init
from lednet_tpu.ops import avg_pool2d, global_avg_pool
from lednet_tpu.registry import MODELS


class _ResNeXtBottleneck(nn.Module):
    in_channels: int
    channels: int
    stride: int = 1
    dilation: int = 1
    downsample: bool = False
    avg_down: bool = False
    norm_cfg: Optional[Dict] = None
    groups: int = 32
    base_width: int = 4
    expansion: int = 4

    @nn.compact
    def __call__(self, x, train: bool = False):
        norm_cfg = self.norm_cfg or dict(type='BN')
        width = max(int(self.channels * (self.base_width / 64.0)), 1) * self.groups
        identity = x
        out = ConvModule(self.in_channels, width, 1, norm_cfg=norm_cfg,
                         act_cfg=dict(type='ReLU'), name='conv1')(x, train=train)
        out = ConvModule(width, width, 3, stride=self.stride,
                         padding=self.dilation, dilation=self.dilation,
                         groups=self.groups, norm_cfg=norm_cfg,
                         act_cfg=dict(type='ReLU'), name='conv2')(out, train=train)
        out = ConvModule(width, self.channels * self.expansion, 1,
                         norm_cfg=norm_cfg, act_cfg=None,
                         name='conv3')(out, train=train)
        if self.downsample:
            identity = x
            stride = self.stride
            if self.avg_down and stride != 1:
                identity = avg_pool2d(identity, stride, stride, 0)
                stride = 1
            identity = nn.Conv(self.channels * self.expansion, (1, 1),
                               strides=(stride, stride), use_bias=False,
                               kernel_init=kaiming_init,
                               name='downsample_conv')(identity)
            identity = Norm2d(norm_cfg, name='downsample_norm')(identity,
                                                                train=train)
        return nn.relu(out + identity)


@MODELS.register_module()
class ResNeXt(ResNet):
    groups: int = 32
    base_width: int = 4

    arch_settings = {
        50: (_ResNeXtBottleneck, (3, 4, 6, 3)),
        101: (_ResNeXtBottleneck, (3, 4, 23, 3)),
        152: (_ResNeXtBottleneck, (3, 8, 36, 3)),
    }


class _SplitAttnBottleneck(nn.Module):
    """ResNeSt split-attention bottleneck, radix 2 (reference
    ``mmseg/models/backbones/resnest.py``): SplitAttentionConv2d runs at
    stride 1 with ``inter_channels = max(width * radix // reduction_factor,
    32)`` (``:73``); when ``stride > 1`` the stride is carried by an
    ``AvgPool2d(3, stride, padding=1)`` avd layer AFTER it (``:185,216``,
    ``avg_down_stride=True`` default)."""
    in_channels: int
    channels: int
    stride: int = 1
    dilation: int = 1
    downsample: bool = False
    avg_down: bool = True
    norm_cfg: Optional[Dict] = None
    radix: int = 2
    reduction_factor: int = 4
    expansion: int = 4

    @nn.compact
    def __call__(self, x, train: bool = False):
        norm_cfg = self.norm_cfg or dict(type='BN')
        width = self.channels
        r = self.radix
        identity = x
        out = ConvModule(self.in_channels, width, 1, norm_cfg=norm_cfg,
                         act_cfg=dict(type='ReLU'), name='conv1')(x, train=train)
        # radix-expanded grouped conv, stride 1 (avd pool carries the stride)
        out = ConvModule(width, width * r, 3, padding=self.dilation,
                         dilation=self.dilation, groups=r, norm_cfg=norm_cfg,
                         act_cfg=dict(type='ReLU'), name='conv2')(out, train=train)
        B, H, W, _ = out.shape
        splits = out.reshape(B, H, W, r, width)
        gap = jnp.sum(splits, axis=3)
        gap = global_avg_pool(gap)
        inter = max(width * r // self.reduction_factor, 32)
        gap = ConvModule(width, inter, 1, norm_cfg=norm_cfg,
                         act_cfg=dict(type='ReLU'), name='fc1')(gap, train=train)
        attn = nn.Conv(width * r, (1, 1), name='fc2')(gap)
        attn = nn.softmax(attn.reshape(B, 1, 1, r, width), axis=3)
        out = jnp.sum(splits * attn, axis=3)
        if self.stride > 1:
            out = avg_pool2d(out, 3, self.stride, 1)
        out = ConvModule(width, self.channels * self.expansion, 1,
                         norm_cfg=norm_cfg, act_cfg=None,
                         name='conv3')(out, train=train)
        if self.downsample:
            identity = x
            stride = self.stride
            if self.avg_down and stride != 1:
                identity = avg_pool2d(identity, stride, stride, 0)
                stride = 1
            identity = nn.Conv(self.channels * self.expansion, (1, 1),
                               strides=(stride, stride), use_bias=False,
                               kernel_init=kaiming_init,
                               name='downsample_conv')(identity)
            identity = Norm2d(norm_cfg, name='downsample_norm')(identity,
                                                                train=train)
        return nn.relu(out + identity)


@MODELS.register_module()
class ResNeSt(ResNet):
    radix: int = 2
    reduction_factor: int = 4
    deep_stem: bool = True
    avg_down: bool = True

    arch_settings = {
        50: (_SplitAttnBottleneck, (3, 4, 6, 3)),
        101: (_SplitAttnBottleneck, (3, 4, 23, 3)),
        200: (_SplitAttnBottleneck, (3, 24, 36, 3)),
    }


@MODELS.register_module()
class BEiT(nn.Module):
    """BEiT/MAE surface: a ViT without cls-token position handling, LN-pre
    blocks (reference ``mmseg/models/backbones/beit.py``/``mae.py`` config
    surface; rel-pos-bias is folded into standard attention here)."""
    img_size: int = 640
    patch_size: int = 16
    in_channels: int = 3
    embed_dims: int = 768
    num_layers: int = 12
    num_heads: int = 12
    mlp_ratio: int = 4
    out_indices: Sequence[int] = (3, 5, 7, 11)
    qv_bias: bool = True
    attn_drop_rate: float = 0.0
    drop_path_rate: float = 0.1
    norm_cfg: Optional[Dict] = None
    act_cfg: Optional[Dict] = None
    init_values: float = 0.1
    pretrained: Optional[str] = None
    init_cfg: Optional[Dict] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        from lednet_tpu.models.backbones.vit import _MHSA
        B = x.shape[0]
        p = self.patch_size
        x = nn.Conv(self.embed_dims, (p, p), strides=(p, p),
                    name='patch_embed')(x)
        gh, gw = x.shape[1], x.shape[2]
        x = x.reshape(B, gh * gw, self.embed_dims)
        outs = []
        for i in range(self.num_layers):
            g1 = self.param(f'b{i}_gamma1',
                            nn.initializers.constant(self.init_values),
                            (self.embed_dims,), jnp.float32)
            g2 = self.param(f'b{i}_gamma2',
                            nn.initializers.constant(self.init_values),
                            (self.embed_dims,), jnp.float32)
            h = nn.LayerNorm(name=f'b{i}_norm1')(x)
            x = x + g1.astype(x.dtype) * _MHSA(self.embed_dims,
                                               self.num_heads,
                                               name=f'b{i}_attn')(h)
            h = nn.LayerNorm(name=f'b{i}_norm2')(x)
            m = nn.Dense(self.embed_dims * self.mlp_ratio,
                         name=f'b{i}_fc1')(h)
            m = nn.gelu(m, approximate=False)
            x = x + g2.astype(x.dtype) * nn.Dense(self.embed_dims,
                                                  name=f'b{i}_fc2')(m)
            if i in self.out_indices:
                outs.append(x.reshape(B, gh, gw, self.embed_dims))
        return tuple(outs)


@MODELS.register_module()
class MAE(BEiT):
    pass


@MODELS.register_module()
class TIMMBackbone:
    """Gated stub: the reference wraps torch/timm models
    (``timm_backbone.py:63``); a torch module cannot join the jax compute
    graph, so this surface raises with a porting hint."""

    def __init__(self, *args, **kwargs):
        raise NotImplementedError(
            'TIMMBackbone wraps torch models and has no TPU-native '
            'equivalent; pick a native backbone (ResNet/Swin/MiT/...) or '
            'convert weights with tools/model_converters/mmseg2jax.py')


@MODELS.register_module()
class VPD:
    """Gated stub: the reference's VPD backbone requires the vendored
    latent-diffusion/CLIP checkout (absent even in the reference snapshot —
    ``src/`` is empty; SURVEY.md §0.5)."""

    def __init__(self, *args, **kwargs):
        raise NotImplementedError(
            'VPD depends on latent-diffusion/CLIP weights that are not '
            'available; see the reference requirements/multimodal.txt')

