"""Multi-scale deformable-attention pixel decoder (Mask2Former).

Behavioral spec: mmdet's ``MSDeformAttnPixelDecoder`` as used by the
reference ``mmseg/models/decode_heads/mask2former_head.py`` (which wraps
mmdet): the three coarsest feature levels are projected to a common width,
flattened with level embeddings, refined by ``num_encoder_layers`` of
multi-scale deformable self-attention (each token samples
``num_points`` learned offsets per level per head, bilinearly, zero padded
out of range), then rebuilt into maps; an FPN lateral step to the finest
level yields the mask features.

TPU note: deformable attention is gather-bound, which maps poorly onto the
MXU/HBM model — this decoder is therefore an OPT-IN alternative
(``pixel_decoder='msdeform'`` on MaskFormer/Mask2Former heads); the default
FPN pixel decoder is the TPU-first choice. Kept for architectural parity
and for transplanting mmdet-trained weights.
"""
from __future__ import annotations

from typing import List, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


def bilinear_sample(value, coords):
    """value (B, H, W, C); coords (B, N, 2) in [0, 1] (x, y) —
    grid_sample(align_corners=False, padding_mode='zeros') semantics."""
    B, H, W, C = value.shape
    x = coords[..., 0] * W - 0.5
    y = coords[..., 1] * H - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = x - x0
    wy = y - y0

    def gather(yi, xi):
        inside = (xi >= 0) & (xi < W) & (yi >= 0) & (yi < H)
        xi = jnp.clip(xi, 0, W - 1).astype(jnp.int32)
        yi = jnp.clip(yi, 0, H - 1).astype(jnp.int32)
        flat = value.reshape(B, H * W, C)
        idx = yi * W + xi
        out = jnp.take_along_axis(flat, idx[..., None], axis=1)
        return out * inside[..., None]

    v00 = gather(y0, x0)
    v01 = gather(y0, x0 + 1)
    v10 = gather(y0 + 1, x0)
    v11 = gather(y0 + 1, x0 + 1)
    top = v00 * (1 - wx)[..., None] + v01 * wx[..., None]
    bot = v10 * (1 - wx)[..., None] + v11 * wx[..., None]
    return top * (1 - wy)[..., None] + bot * wy[..., None]


class MSDeformAttn(nn.Module):
    """Multi-scale deformable attention (Deformable-DETR style)."""
    dims: int = 256
    num_heads: int = 8
    num_levels: int = 3
    num_points: int = 4

    @nn.compact
    def __call__(self, query, value_maps: List[jnp.ndarray], ref_points):
        """query (B, Nq, D); value_maps: per-level (B, Hl, Wl, D);
        ref_points (B, Nq, 2) normalized (x, y)."""
        B, Nq, D = query.shape
        Hh, L, P = self.num_heads, self.num_levels, self.num_points
        hd = D // Hh

        offsets = nn.Dense(Hh * L * P * 2, name='sampling_offsets',
                           kernel_init=nn.initializers.zeros)(query)
        offsets = offsets.reshape(B, Nq, Hh, L, P, 2)
        attn = nn.Dense(Hh * L * P, name='attention_weights')(query)
        attn = nn.softmax(attn.reshape(B, Nq, Hh, L * P), axis=-1)
        attn = attn.reshape(B, Nq, Hh, L, P)

        out = jnp.zeros((B, Nq, Hh, hd), query.dtype)
        for lv, vmap in enumerate(value_maps):
            Hl, Wl = vmap.shape[1], vmap.shape[2]
            v = nn.Dense(D, name=f'value_proj{lv}')(vmap)
            v = v.reshape(B, Hl, Wl, Hh, hd)
            scale = jnp.asarray([Wl, Hl], query.dtype)
            for h in range(Hh):
                coords = (ref_points[:, :, None]
                          + offsets[:, :, h, lv] / scale)  # (B, Nq, P, 2)
                sampled = bilinear_sample(
                    v[..., h, :], coords.reshape(B, Nq * P, 2))
                sampled = sampled.reshape(B, Nq, P, hd)
                out = out.at[:, :, h].add(
                    (sampled * attn[:, :, h, lv, :, None]).sum(2))
        return nn.Dense(D, name='output_proj')(out.reshape(B, Nq, D))


class _EncoderLayer(nn.Module):
    dims: int
    num_heads: int
    num_levels: int
    num_points: int
    ffn_ratio: int = 4

    @nn.compact
    def __call__(self, tokens, value_maps, ref_points):
        h = MSDeformAttn(self.dims, self.num_heads, self.num_levels,
                         self.num_points, name='attn')(tokens, value_maps,
                                                       ref_points)
        tokens = nn.LayerNorm(name='norm1')(tokens + h)
        m = nn.relu(nn.Dense(self.ffn_ratio * self.dims, name='fc1')(tokens))
        return nn.LayerNorm(name='norm2')(
            tokens + nn.Dense(self.dims, name='fc2')(m))


class MSDeformAttnPixelDecoder(nn.Module):
    """Returns (mask_features at the finest level, encoded coarsest map)."""
    feat_channels: int = 256
    num_encoder_layers: int = 6
    num_heads: int = 8
    num_points: int = 4

    @nn.compact
    def __call__(self, xs: Sequence[jnp.ndarray], train: bool = False
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """xs: multi-level NHWC features, finest first (1/4, 1/8, 1/16,
        1/32 for Mask2Former)."""
        from lednet_tpu.models.layers import ConvModule
        from lednet_tpu.ops.resize import resize_bilinear
        D = self.feat_channels
        coarse = list(xs[1:])  # deformable levels: all but the finest
        L = len(coarse)

        proj = [nn.Conv(D, (1, 1), name=f'input_proj{i}')(x)
                for i, x in enumerate(coarse)]
        level_embed = self.param('level_embed',
                                 nn.initializers.normal(1.0), (L, D))

        shapes = [(p.shape[1], p.shape[2]) for p in proj]
        tokens, refs = [], []
        B = proj[0].shape[0]
        for i, p in enumerate(proj):
            Hl, Wl = shapes[i]
            tokens.append(p.reshape(B, Hl * Wl, D)
                          + level_embed[i][None, None])
            ys, xc = jnp.meshgrid(
                (jnp.arange(Hl) + 0.5) / Hl, (jnp.arange(Wl) + 0.5) / Wl,
                indexing='ij')
            refs.append(jnp.stack([xc, ys], -1).reshape(1, Hl * Wl, 2))
        flat = jnp.concatenate(tokens, axis=1)
        ref_points = jnp.broadcast_to(
            jnp.concatenate(refs, axis=1),
            (B, flat.shape[1], 2)).astype(flat.dtype)

        def split(t):
            outs, start = [], 0
            for Hl, Wl in shapes:
                outs.append(t[:, start:start + Hl * Wl].reshape(B, Hl, Wl, D))
                start += Hl * Wl
            return outs

        for li in range(self.num_encoder_layers):
            flat = _EncoderLayer(D, self.num_heads, L, self.num_points,
                                 name=f'enc{li}')(flat, split(flat),
                                                  ref_points)
        maps = split(flat)

        # FPN top-down: coarsest -> finest deformable level, then one more
        # lateral step down to the finest input level
        h = maps[-1]
        for i in range(len(maps) - 2, -1, -1):
            h = maps[i] + resize_bilinear(h, maps[i].shape[1:3], False)
        lateral = ConvModule(xs[0].shape[-1], D, 1,
                             norm_cfg=dict(type='GN', num_groups=32),
                             act_cfg=None, name='lateral')(xs[0], train=train)
        h = lateral + resize_bilinear(h, lateral.shape[1:3], False)
        mask_features = ConvModule(D, D, 3, padding=1, norm_cfg=None,
                                   act_cfg=None, name='mask_feat')(
            h, train=train)
        return mask_features, maps[-1]
