"""ResNeXt / ResNeSt-lite backbones.

Behavioral specs: reference ``mmseg/models/backbones/resnext.py`` (grouped
3x3 bottleneck with ``groups``/``base_width``) and ``resnest.py``
(split-attention bottleneck; implemented here with radix-2 split attention,
the configuration every in-tree resnest config uses).
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

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
        if self.groups == 1:
            # reference special case (resnext.py:28-29): plain-width 3x3
            width = self.channels
        else:
            width = max(int(self.channels * (self.base_width / 64.0)),
                        1) * self.groups
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

    def _block_kwargs(self):
        return dict(groups=self.groups, base_width=self.base_width)


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

    def _block_kwargs(self):
        return dict(radix=self.radix,
                    reduction_factor=self.reduction_factor)


def _beit_rel_pos_index(wh: int, ww: int):
    """(Wh*Ww+1, Wh*Ww+1) relative-position index with the three special
    cls entries, reference ``beit.py:78-112``."""
    import numpy as np
    coords = np.stack(np.meshgrid(np.arange(wh), np.arange(ww),
                                  indexing='ij'))          # (2, Wh, Ww)
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]               # (2, N, N)
    rel = rel.transpose(1, 2, 0).astype(np.int64)
    rel[:, :, 0] += wh - 1
    rel[:, :, 1] += ww - 1
    rel[:, :, 0] *= 2 * ww - 1
    num_rel = (2 * wh - 1) * (2 * ww - 1) + 3
    index = np.zeros((wh * ww + 1, wh * ww + 1), np.int64)
    index[1:, 1:] = rel.sum(-1)
    index[0, 0:] = num_rel - 3
    index[0:, 0] = num_rel - 2
    index[0, 0] = num_rel - 1
    return index, num_rel


class _BEiTAttention(nn.Module):
    """BEiT attention: qv-bias (zero k bias) + relative position bias with
    cls rows (reference ``beit.py:23-149``). ``window`` is the training
    grid (img_size // patch); when the runtime grid differs, the grid part
    of the bias table is bilinearly resampled (the reference does an
    equivalent geometric resample at checkpoint-load time,
    ``beit.py:330-376`` — documented divergence)."""
    embed_dims: int
    num_heads: int
    window: tuple
    grid: tuple
    qv_bias: bool = True

    @nn.compact
    def __call__(self, x):
        from lednet_tpu.ops.resize import resize_bilinear
        B, N, C = x.shape
        nh, hd = self.num_heads, C // self.num_heads
        wh, ww = self.window
        gh, gw = self.grid
        qkv_w = nn.Dense(3 * C, use_bias=False, name='qkv')(x)
        if self.qv_bias:
            q_bias = self.param('q_bias', nn.initializers.zeros, (C,),
                                jnp.float32)
            v_bias = self.param('v_bias', nn.initializers.zeros, (C,),
                                jnp.float32)
            bias = jnp.concatenate([q_bias, jnp.zeros_like(q_bias), v_bias])
            qkv_w = qkv_w + bias.astype(qkv_w.dtype)
        qkv = qkv_w.reshape(B, N, 3, nh, hd)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        attn = jnp.einsum('bnhd,bmhd->bhnm', q, k,
                          preferred_element_type=jnp.float32) * hd ** -0.5

        num_rel = (2 * wh - 1) * (2 * ww - 1) + 3
        table = self.param('relative_position_bias_table',
                           nn.initializers.zeros, (num_rel, nh), jnp.float32)
        grid_tab, special = table[:num_rel - 3], table[num_rel - 3:]
        if (gh, gw) != (wh, ww):
            grid_tab = grid_tab.reshape(2 * wh - 1, 2 * ww - 1, nh)
            grid_tab = resize_bilinear(grid_tab[None],
                                       (2 * gh - 1, 2 * gw - 1), True)[0]
            grid_tab = grid_tab.reshape(-1, nh)
        index, _ = _beit_rel_pos_index(gh, gw)
        full_tab = jnp.concatenate([grid_tab, special], axis=0)
        bias = jnp.take(full_tab, jnp.asarray(index.reshape(-1)), axis=0)
        bias = bias.reshape(gh * gw + 1, gh * gw + 1, nh).transpose(2, 0, 1)
        attn = attn + bias[None].astype(attn.dtype)

        attn = nn.softmax(attn, axis=-1).astype(v.dtype)
        out = jnp.einsum('bhnm,bmhd->bnhd', attn, v,
                         preferred_element_type=jnp.float32).astype(v.dtype)
        return nn.Dense(C, name='proj')(out.reshape(B, N, C))


@MODELS.register_module()
class BEiT(nn.Module):
    """BEiT backbone (reference ``mmseg/models/backbones/beit.py:227-553``):
    patch embed + cls token (no abs pos embed), pre-LN blocks with BEiT
    attention, gamma_1/2 layer scaling, stochastic depth, optional final
    norm; outputs strip the cls token back to NHWC grids."""
    img_size: Any = 224
    patch_size: int = 16
    in_channels: int = 3
    embed_dims: int = 768
    num_layers: int = 12
    num_heads: int = 12
    mlp_ratio: int = 4
    out_indices: Sequence[int] = (3, 5, 7, 11)
    qv_bias: bool = True
    attn_drop_rate: float = 0.0
    drop_path_rate: float = 0.0
    norm_cfg: Optional[Dict] = None
    act_cfg: Optional[Dict] = None
    patch_norm: bool = False
    final_norm: bool = False
    num_fcs: int = 2
    norm_eval: bool = False
    init_values: float = 0.1
    pretrained: Optional[str] = None
    init_cfg: Optional[Dict] = None

    with_abs_pos: bool = False  # MAE adds the absolute pos embed

    @nn.compact
    def __call__(self, x, train: bool = False):
        from lednet_tpu.models.layers import DropPath
        from lednet_tpu.ops.resize import resize_bicubic
        B, H, W, _ = x.shape
        p = self.patch_size
        pad_h, pad_w = (-H) % p, (-W) % p
        if pad_h or pad_w:
            x = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
        x = nn.Conv(self.embed_dims, (p, p), strides=(p, p), padding='VALID',
                    name='patch_embed')(x)
        gh, gw = x.shape[1], x.shape[2]
        x = x.reshape(B, gh * gw, self.embed_dims)

        if isinstance(self.img_size, (tuple, list)):
            wh, ww = self.img_size[0] // p, self.img_size[1] // p
        else:
            wh = ww = self.img_size // p

        cls = self.param('cls_token', nn.initializers.zeros,
                         (1, 1, self.embed_dims), jnp.float32)
        x = jnp.concatenate(
            [jnp.broadcast_to(cls, (B, 1, self.embed_dims)).astype(x.dtype),
             x], axis=1)
        if self.with_abs_pos:
            pos = self.param('pos_embed',
                             nn.initializers.truncated_normal(0.02),
                             (1, wh * ww + 1, self.embed_dims), jnp.float32)
            cls_pos, grid_pos = pos[:, :1], pos[:, 1:]
            if (gh, gw) != (wh, ww):
                grid_pos = resize_bicubic(
                    grid_pos.reshape(1, wh, ww, self.embed_dims),
                    (gh, gw), False).reshape(1, gh * gw, self.embed_dims)
            x = x + jnp.concatenate([cls_pos, grid_pos], axis=1).astype(x.dtype)

        dpr = [self.drop_path_rate * i / max(self.num_layers - 1, 1)
               for i in range(self.num_layers)]
        outs = []
        for i in range(self.num_layers):
            g1 = self.param(f'b{i}_gamma1',
                            nn.initializers.constant(self.init_values),
                            (self.embed_dims,), jnp.float32)
            g2 = self.param(f'b{i}_gamma2',
                            nn.initializers.constant(self.init_values),
                            (self.embed_dims,), jnp.float32)
            h = nn.LayerNorm(name=f'b{i}_norm1')(x)
            h = _BEiTAttention(self.embed_dims, self.num_heads,
                               (wh, ww), (gh, gw), self.qv_bias,
                               name=f'b{i}_attn')(h)
            x = x + DropPath(dpr[i])(g1.astype(x.dtype) * h, train=train)
            h = nn.LayerNorm(name=f'b{i}_norm2')(x)
            m = nn.Dense(self.embed_dims * self.mlp_ratio,
                         name=f'b{i}_fc1')(h)
            m = nn.gelu(m, approximate=False)
            m = nn.Dense(self.embed_dims, name=f'b{i}_fc2')(m)
            x = x + DropPath(dpr[i])(g2.astype(x.dtype) * m, train=train)
            if i == self.num_layers - 1 and self.final_norm:
                x = nn.LayerNorm(name='final_norm')(x)
            if i in self.out_indices:
                outs.append(x[:, 1:].reshape(B, gh, gw, self.embed_dims))
        return tuple(outs)


@MODELS.register_module()
class MAE(BEiT):
    """MAE backbone (reference ``mmseg/models/backbones/mae.py:46-260``):
    BEiT blocks (zero-init rel-pos bias) plus an absolute position
    embedding added after the cls token."""
    with_abs_pos: bool = True


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

