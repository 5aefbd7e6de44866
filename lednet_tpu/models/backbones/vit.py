"""Vision Transformer backbone.

Behavioral spec: reference ``mmseg/models/backbones/vit.py`` — patch embed
(16x16 conv), learned position embedding (bilinearly resized for new grids),
pre-LN transformer blocks, selected ``out_indices`` reshaped back to NHWC
grids, optional final LN. Also covers the MAE/BEiT-style usage surface (same
ctor keys accepted).
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp

from lednet_tpu.models.layers import DropPath
from lednet_tpu.ops.resize import resize
from lednet_tpu.registry import MODELS


class _MHSA(nn.Module):
    dim: int
    num_heads: int
    qkv_bias: bool = True
    attn_drop: float = 0.0
    proj_drop: float = 0.0

    @nn.compact
    def __call__(self, x, train: bool = False):
        B, N, C = x.shape
        hd = C // self.num_heads
        qkv = nn.Dense(3 * C, use_bias=self.qkv_bias, name='qkv')(x)
        qkv = qkv.reshape(B, N, 3, self.num_heads, hd)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        attn = jnp.einsum('bnhd,bmhd->bhnm', q, k,
                          preferred_element_type=jnp.float32) * hd ** -0.5
        attn = nn.softmax(attn, axis=-1).astype(v.dtype)
        if self.attn_drop:
            attn = nn.Dropout(self.attn_drop, deterministic=not train)(attn)
        out = jnp.einsum('bhnm,bmhd->bnhd', attn, v,
                         preferred_element_type=jnp.float32).astype(v.dtype)
        out = nn.Dense(C, name='proj')(out.reshape(B, N, C))
        if self.proj_drop:
            out = nn.Dropout(self.proj_drop, deterministic=not train)(out)
        return out


@MODELS.register_module()
class VisionTransformer(nn.Module):
    img_size: Any = 224  # int or (h, w), mmseg-config compatible
    patch_size: int = 16
    in_channels: int = 3
    embed_dims: int = 768
    num_layers: int = 12
    num_heads: int = 12
    mlp_ratio: int = 4
    out_indices: Sequence[int] = (2, 5, 8, 11)
    qkv_bias: bool = True
    drop_rate: float = 0.0
    attn_drop_rate: float = 0.0
    drop_path_rate: float = 0.0
    with_cls_token: bool = True
    output_cls_token: bool = False
    final_norm: bool = False
    interpolate_mode: str = 'bicubic'
    norm_cfg: Optional[Dict] = None
    act_cfg: Optional[Dict] = None
    patch_norm: bool = False
    pre_norm: bool = False
    norm_eval: bool = False
    with_cp: bool = False
    frozen_exclude: Sequence[str] = ()
    pretrained: Optional[str] = None
    init_cfg: Optional[Dict] = None

    out_origin: bool = False
    patch_pad: str = 'corner'
    patch_bias: bool = False

    def _grid_out(self, x, gh, gw):
        """token sequence -> (NHWC grid[, cls]) per the output contract."""
        B = x.shape[0]
        out = x[:, 1:] if self.with_cls_token else x
        out = out.reshape(B, gh, gw, self.embed_dims)
        if self.output_cls_token and self.with_cls_token:
            # (feature map, cls token) pairs — the contract SAN's
            # side adapter + mask recognition consume
            return (out, x[:, 0])
        return out

    @nn.compact
    def __call__(self, x, train: bool = False):
        B, H, W, _ = x.shape
        p = self.patch_size
        # mmcv PatchEmbed pads 'corner': bottom/right only, then VALID conv
        pad_h, pad_w = (-H) % p, (-W) % p
        if pad_h or pad_w:
            x = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
        x = nn.Conv(self.embed_dims, (p, p), strides=(p, p), padding='VALID',
                    use_bias=self.patch_bias, name='patch_embed')(x)
        gh, gw = x.shape[1], x.shape[2]
        x = x.reshape(B, gh * gw, self.embed_dims)

        if isinstance(self.img_size, (tuple, list)):
            nb_h, nb_w = self.img_size[0] // p, self.img_size[1] // p
        else:
            nb_h = nb_w = self.img_size // p
        # pos_embed always carries the cls slot, as the reference does
        # (``vit.py:265-267``) even when with_cls_token=False.
        pos = self.param('pos_embed', nn.initializers.truncated_normal(0.02),
                         (1, nb_h * nb_w + 1, self.embed_dims), jnp.float32)
        cls_pos, grid_pos = pos[:, :1], pos[:, 1:]
        grid_pos = grid_pos.reshape(1, nb_h, nb_w, self.embed_dims)
        if (gh, gw) != (nb_h, nb_w):
            # reference resize_pos_embed (``vit.py:416-444``):
            # interpolate_mode (bicubic default), align_corners=False
            grid_pos = resize(grid_pos, (gh, gw), mode=self.interpolate_mode,
                              align_corners=False)
        grid_pos = grid_pos.reshape(1, gh * gw, self.embed_dims)

        cls = self.param('cls_token', nn.initializers.zeros,
                         (1, 1, self.embed_dims), jnp.float32)
        x = jnp.concatenate(
            [jnp.broadcast_to(cls, (B, 1, self.embed_dims)).astype(x.dtype),
             x], axis=1)
        x = x + jnp.concatenate([cls_pos, grid_pos], axis=1).astype(x.dtype)
        if self.drop_rate:
            x = nn.Dropout(self.drop_rate, deterministic=not train)(x)
        if not self.with_cls_token:
            x = x[:, 1:]
        if self.pre_norm:
            x = nn.LayerNorm(name='pre_ln')(x)

        outs = []
        if self.out_origin:
            outs.append(self._grid_out(x, gh, gw))
        dpr = [self.drop_path_rate * i / max(self.num_layers - 1, 1)
               for i in range(self.num_layers)]
        last = self.num_layers - 1
        for i in range(self.num_layers):
            h = nn.LayerNorm(name=f'b{i}_norm1')(x)
            h = _MHSA(self.embed_dims, self.num_heads, self.qkv_bias,
                      self.attn_drop_rate, self.drop_rate,
                      name=f'b{i}_attn')(h, train=train)
            x = x + DropPath(dpr[i])(h, train=train)
            h = nn.LayerNorm(name=f'b{i}_norm2')(x)
            m = nn.Dense(self.embed_dims * self.mlp_ratio,
                         name=f'b{i}_fc1')(h)
            m = nn.gelu(m, approximate=False)
            if self.drop_rate:
                m = nn.Dropout(self.drop_rate, deterministic=not train)(m)
            m = nn.Dense(self.embed_dims, name=f'b{i}_fc2')(m)
            if self.drop_rate:
                m = nn.Dropout(self.drop_rate, deterministic=not train)(m)
            x = x + DropPath(dpr[i])(m, train=train)
            if i == last and self.final_norm:
                # the reference norms the token stream itself after the
                # last layer (``vit.py:478-481``) — outputs taken at
                # earlier indices stay un-normed.
                x = nn.LayerNorm(name='final_norm')(x)
            if i in self.out_indices:
                outs.append(self._grid_out(x, gh, gw))
        return tuple(outs)


MODELS.register_module(name='VIT', module=VisionTransformer)


@MODELS.register_module()
class SwinTransformer(nn.Module):
    """Swin backbone (reference ``mmseg/models/backbones/swin.py``):
    4x4 patch embed, stages of windowed MSA blocks alternating regular and
    shifted windows, patch-merging downsampling, per-stage LN outputs."""
    pretrain_img_size: int = 224
    in_channels: int = 3
    embed_dims: int = 96
    patch_size: int = 4
    window_size: int = 7
    mlp_ratio: int = 4
    depths: Sequence[int] = (2, 2, 6, 2)
    num_heads: Sequence[int] = (3, 6, 12, 24)
    strides: Sequence[int] = (4, 2, 2, 2)
    out_indices: Sequence[int] = (0, 1, 2, 3)
    qkv_bias: bool = True
    qk_scale: Optional[float] = None
    patch_norm: bool = True
    drop_rate: float = 0.0
    attn_drop_rate: float = 0.0
    drop_path_rate: float = 0.0
    use_abs_pos_embed: bool = False
    act_cfg: Optional[Dict] = None
    norm_cfg: Optional[Dict] = None
    pretrained: Optional[str] = None
    frozen_stages: int = -1
    init_cfg: Optional[Dict] = None
    with_cp: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        from lednet_tpu.models.getb import _relative_position_index, _reflect_pad
        B = x.shape[0]
        p = self.patch_size
        x = nn.Conv(self.embed_dims, (p, p), strides=(p, p),
                    name='patch_embed')(x)
        if self.patch_norm:
            x = nn.LayerNorm(name='patch_norm')(x)

        ws = self.window_size
        outs = []
        dim = self.embed_dims
        total = sum(self.depths)
        dpr = [self.drop_path_rate * i / max(total - 1, 1)
               for i in range(total)]
        done = 0
        for s, (depth, heads) in enumerate(zip(self.depths, self.num_heads)):
            for b in range(depth):
                shift = (ws // 2) if b % 2 == 1 else 0
                x = self._block(x, dim, heads, ws, shift, train,
                                name_prefix=f's{s}_b{b}',
                                drop_path=dpr[done])
                done += 1
            outs.append(nn.LayerNorm(name=f'out_norm{s}')(x))
            if s < len(self.depths) - 1:
                # patch merging: 2x2 neighborhood concat + linear reduce
                B_, H, W, C = x.shape
                pad_h, pad_w = H % 2, W % 2
                if pad_h or pad_w:
                    x = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
                    H, W = H + pad_h, W + pad_w
                x = x.reshape(B_, H // 2, 2, W // 2, 2, C)
                x = x.transpose(0, 1, 3, 4, 2, 5).reshape(B_, H // 2, W // 2,
                                                          4 * C)
                x = nn.LayerNorm(name=f'merge_norm{s}')(x)
                x = nn.Dense(2 * C, use_bias=False, name=f'merge{s}')(x)
                dim *= 2
        return tuple(outs[i] for i in self.out_indices)

    def _block(self, x, dim, heads, ws, shift, train, name_prefix,
               drop_path=0.0):
        import numpy as np
        from lednet_tpu.models.getb import _relative_position_index
        B, H, W, C = x.shape
        h = nn.LayerNorm(name=f'{name_prefix}_norm1')(x)
        # reference order (``swin.py``/timm): pad to window multiples FIRST,
        # then cyclic-shift — the wrap brings in real bottom/right content
        pad_h = (-H) % ws
        pad_w = (-W) % ws
        if pad_h or pad_w:
            h = jnp.pad(h, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
        Hp, Wp = H + pad_h, W + pad_w
        if shift:
            h = jnp.roll(h, (-shift, -shift), axis=(1, 2))
        nh, nw = Hp // ws, Wp // ws
        hd = C // heads

        qkv = nn.Dense(3 * C, use_bias=self.qkv_bias,
                       name=f'{name_prefix}_qkv')(h)
        qkv = qkv.reshape(B, nh, ws, nw, ws, 3, heads, hd)
        qkv = qkv.transpose(5, 0, 1, 3, 6, 2, 4, 7).reshape(
            3, B * nh * nw, heads, ws * ws, hd)
        q, k, v = qkv[0], qkv[1], qkv[2]
        attn = jnp.einsum('bhnd,bhmd->bhnm', q, k,
                          preferred_element_type=jnp.float32) * hd ** -0.5
        table = self.param(f'{name_prefix}_rel_bias',
                           nn.initializers.truncated_normal(0.02),
                           ((2 * ws - 1) ** 2, heads), jnp.float32)
        idx = jnp.asarray(_relative_position_index(ws).reshape(-1))
        bias = jnp.take(table, idx, axis=0).reshape(ws * ws, ws * ws, heads)
        attn = attn + bias.transpose(2, 0, 1)[None]
        if shift:
            # shifted-window mask (reference ``swin.py`` img_mask): tokens
            # wrapped across the cyclic shift must not attend each other
            img_mask = np.zeros((Hp, Wp), np.int32)
            cnt = 0
            for hs in (slice(0, -ws), slice(-ws, -shift),
                       slice(-shift, None)):
                for wsl in (slice(0, -ws), slice(-ws, -shift),
                            slice(-shift, None)):
                    img_mask[hs, wsl] = cnt
                    cnt += 1
            wins = img_mask.reshape(nh, ws, nw, ws).transpose(
                0, 2, 1, 3).reshape(nh * nw, ws * ws)
            amask = (wins[:, None, :] != wins[:, :, None]) * -100.0
            amask = jnp.asarray(amask, attn.dtype)  # (nW, N, N)
            attn = attn.reshape(B, nh * nw, heads, ws * ws, ws * ws)
            attn = attn + amask[None, :, None]
            attn = attn.reshape(B * nh * nw, heads, ws * ws, ws * ws)
        attn = nn.softmax(attn, axis=-1).astype(v.dtype)
        out = jnp.einsum('bhnm,bhmd->bhnd', attn, v,
                         preferred_element_type=jnp.float32).astype(v.dtype)
        out = out.reshape(B, nh, nw, heads, ws, ws, hd)
        out = out.transpose(0, 1, 4, 2, 5, 3, 6).reshape(B, Hp, Wp, C)
        if shift:
            out = jnp.roll(out, (shift, shift), axis=(1, 2))
        out = out[:, :H, :W, :]
        out = nn.Dense(C, name=f'{name_prefix}_proj')(out)
        x = x + DropPath(drop_path)(out, train=train)
        h = nn.LayerNorm(name=f'{name_prefix}_norm2')(x)
        m = nn.Dense(C * self.mlp_ratio, name=f'{name_prefix}_fc1')(h)
        m = nn.gelu(m, approximate=False)
        m = nn.Dense(C, name=f'{name_prefix}_fc2')(m)
        return x + DropPath(drop_path)(m, train=train)
