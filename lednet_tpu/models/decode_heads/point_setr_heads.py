"""PointRend, PSA, SETR-MLA, DPT and Segmenter decode heads.

Behavioral specs from ``mmseg/models/decode_heads/``:
- ``point_head.py`` (PointRend, cascade): sample the K most uncertain points
  of the coarse prediction, classify them from concatenated fine-grained +
  coarse point features (``point_sample`` = bilinear gather — the mmcv CUDA
  op re-expressed as jnp gathers), scatter refined logits back. Train-time
  losses follow the same point sampling.
- ``psa_head.py``: point-wise spatial attention — per-pixel relative-offset
  mask logits cropped into 'collect'/'distribute' position-pair attention
  (the mmcv ``PSAMask`` CUDA op re-expressed as one static gather, see
  :func:`psa_mask`), then the reference's softmax + bmm + proj/bottleneck.
- ``setr_mla_head.py``: multi-level feature aggregation - per-level conv +
  4x upsample, concat, cls.
- ``dpt_head.py``: reassemble ViT tokens at multiple scales + residual conv
  fusion (simplified: conv projections + top-down residual fusion).
- ``segmenter_mask_head.py``: learned class tokens attend over patch tokens
  (2 transformer layers), masks = scaled patch-token/class-token dot.
"""
from __future__ import annotations

from typing import Dict, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from lednet_tpu.models.decode_heads.base import (ClsSeg, build_losses,
                                                 default_loss_by_feat,
                                                 select_inputs, sem_label)
from lednet_tpu.models.decode_heads.psp_aspp import _HeadBase
from lednet_tpu.models.layers import ConvModule, kaiming_init
from lednet_tpu.models.losses.cross_entropy import pixelwise_cross_entropy
from lednet_tpu.ops.resize import resize_bilinear
from lednet_tpu.registry import MODELS


def point_sample(feat, coords):
    """Bilinear sample NHWC ``feat`` at normalized ``coords`` (B, P, 2) in
    [0, 1] (x, y) — the mmcv ``point_sample`` contract, align_corners=False."""
    B, H, W, C = feat.shape
    x = coords[..., 0] * W - 0.5
    y = coords[..., 1] * H - 0.5
    x0 = jnp.clip(jnp.floor(x), 0, W - 1).astype(jnp.int32)
    y0 = jnp.clip(jnp.floor(y), 0, H - 1).astype(jnp.int32)
    x1 = jnp.minimum(x0 + 1, W - 1)
    y1 = jnp.minimum(y0 + 1, H - 1)
    wx = jnp.clip(x - x0, 0, 1)[..., None]
    wy = jnp.clip(y - y0, 0, 1)[..., None]

    def gather(yy, xx):
        idx = yy * W + xx
        return jax.vmap(lambda f, i: f[i])(feat.reshape(B, H * W, C), idx)

    top = gather(y0, x0) * (1 - wx) + gather(y0, x1) * wx
    bot = gather(y1, x0) * (1 - wx) + gather(y1, x1) * wx
    return top * (1 - wy) + bot * wy


@MODELS.register_module()
class PointHead(_HeadBase):
    """Cascade refinement head: __call__(inputs, prev_logits)."""
    num_points: int = 2048
    oversample_ratio: int = 3
    importance_sample_ratio: float = 0.75
    num_fcs: int = 3
    coarse_pred_each_layer: bool = True
    subdivision_steps: int = 2
    subdivision_num_points: int = 8196
    scale_factor: int = 2

    def _uncertainty(self, logits):
        top2 = jax.lax.top_k(logits, 2)[0]
        return top2[..., 1] - top2[..., 0]  # negative margin

    @nn.compact
    def __call__(self, inputs, prev_output=None, train: bool = False,
                 with_aux: bool = True):
        """Returns (refined_logits, point_logits, point_coords).

        Training (reference ``point_head.py:274-326`` get_points_train):
        oversample ``num_points * oversample_ratio`` uniform points, keep the
        ``importance_sample_ratio`` fraction most uncertain *measured on the
        sampled logits* (the reference stresses sampling-then-uncertainty),
        top up with fresh uniform points; the MLP is trained on those points
        only (the refined map is not formed).

        Inference (reference ``point_head.py:204-249``): iterative
        subdivision — upsample the running logits by ``scale_factor``, pick
        the ``subdivision_num_points`` most uncertain grid points, re-predict
        them from fine+coarse point features, scatter back; repeat
        ``subdivision_steps`` times."""
        fine = select_inputs(inputs, self.in_index, self.input_transform,
                             self.align_corners)
        if isinstance(fine, (list, tuple)):
            fine = fine[0]
        assert prev_output is not None, 'PointHead is a cascade head'
        coarse = prev_output
        B = fine.shape[0]
        C = coarse.shape[-1]

        fcs = [nn.Conv(self.channels, (1,), name=f'fc{i}')
               for i in range(self.num_fcs)]
        fc_seg = nn.Conv(self.num_out_channels, (1,), name='fc_seg')

        def mlp(coords):
            fine_pts = point_sample(fine, coords)
            coarse_pts = point_sample(coarse, coords)
            feat = jnp.concatenate([fine_pts, coarse_pts], axis=-1)
            for fc in fcs:
                feat = nn.relu(fc(feat))
                if self.coarse_pred_each_layer:
                    feat = jnp.concatenate([feat, coarse_pts], axis=-1)
            return fc_seg(feat)

        if train:
            rng = (self.make_rng('dropout')
                   if self.scope is not None and self.has_rng('dropout')
                   else jax.random.PRNGKey(0))
            n_over = int(self.num_points * self.oversample_ratio)
            n_imp = int(self.importance_sample_ratio * self.num_points)
            k1, k2 = jax.random.split(rng)
            cand = jax.random.uniform(k1, (B, n_over, 2), jnp.float32)
            unc = self._uncertainty(point_sample(coarse, cand))  # (B, n_over)
            _, idx = jax.lax.top_k(unc, n_imp)
            coords = jnp.take_along_axis(cand, idx[..., None], axis=1)
            n_rand = self.num_points - n_imp
            if n_rand > 0:
                coords = jnp.concatenate(
                    [coords, jax.random.uniform(k2, (B, n_rand, 2),
                                                jnp.float32)], axis=1)
            coords = jax.lax.stop_gradient(coords)
            return coarse, mlp(coords), coords

        # eval: iterative subdivision refinement
        refined = coarse
        point_logits, coords = None, None
        for _ in range(self.subdivision_steps):
            h, w = refined.shape[1:3]
            H, W = h * self.scale_factor, w * self.scale_factor
            refined = resize_bilinear(refined, (H, W), self.align_corners)
            flat_unc = self._uncertainty(refined).reshape(B, H * W)
            k = min(self.subdivision_num_points, H * W)
            _, idx = jax.lax.top_k(flat_unc, k)
            ys = (idx // W).astype(jnp.float32)
            xs = (idx % W).astype(jnp.float32)
            coords = jnp.stack([(xs + 0.5) / W, (ys + 0.5) / H], axis=-1)
            point_logits = mlp(coords)
            rf = refined.reshape(B, H * W, C)
            rf = jax.vmap(lambda r, i, v: r.at[i].set(v))(rf, idx,
                                                          point_logits)
            refined = rf.reshape(B, H, W, C)
        return refined, point_logits, coords

    def loss_by_feat(self, seg_logits, seg_label) -> Dict:
        refined, point_logits, coords = seg_logits
        label = sem_label(seg_label)
        # nearest-mode label sampling (reference point_head.py:254-259 —
        # bilinear would invent intermediate classes at boundaries)
        B, H, W = label.shape[:3]
        ix = jnp.clip((coords[..., 0] * W).astype(jnp.int32), 0, W - 1)
        iy = jnp.clip((coords[..., 1] * H).astype(jnp.int32), 0, H - 1)
        pts = jnp.take_along_axis(label.reshape(B, H * W), iy * W + ix,
                                  axis=1)
        pix, valid = pixelwise_cross_entropy(point_logits, pts,
                                             self.ignore_index)
        loss_point = jnp.sum(pix) / jnp.maximum(jnp.sum(valid), 1)
        return {'loss_point': loss_point}

    def predict_by_feat(self, seg_logits, size=None):
        refined = seg_logits[0] if isinstance(seg_logits, tuple) else seg_logits
        if size is None:
            return refined
        return resize_bilinear(refined, size, self.align_corners)


def psa_mask(y, mask_size):
    """mmcv ``PSAMask`` re-expressed as one static gather.

    ``y`` (B, h, w, mask_h*mask_w): per-position relative-offset logits.
    Returns ``A`` (B, h*w, h*w) with ``A[b, p, t] = y[b, p, rel(t - p))``
    (zero where the offset falls outside the mask window). In the torch
    channel-first layout this single matrix is both ops: collect =
    ``A^T``, distribute = ``A`` (the CUDA kernels differ only in whether
    the output channel indexes the target or the source position)."""
    B, h, w, M = y.shape
    mh, mw = mask_size
    half_h, half_w = (mh - 1) // 2, (mw - 1) // 2
    p = np.arange(h * w)
    py, px = (p // w)[:, None], (p % w)[:, None]
    ty, tx = (p // w)[None, :], (p % w)[None, :]
    dh, dw = ty - py + half_h, tx - px + half_w
    valid = (dh >= 0) & (dh < mh) & (dw >= 0) & (dw < mw)
    idx = np.clip(dh, 0, mh - 1) * mw + np.clip(dw, 0, mw - 1)
    flat = y.reshape(B, h * w, M)
    A = jnp.take_along_axis(flat, jnp.asarray(idx, jnp.int32)[None], axis=2)
    return A * jnp.asarray(valid, flat.dtype)[None]


@MODELS.register_module()
class PSAHead(_HeadBase):
    """Point-wise spatial attention (PSANet) — reference structure
    (``psa_head.py:56-199``): 1x1 reduce -> shrink resize -> attention
    stack (1x1 ConvModule + bias-free 1x1 conv to mask_h*mask_w channels)
    -> PSAMask (static gather replacing the mmcv CUDA op) -> softmax over
    the position axis -> bmm with the reduced features; 'bi-direction'
    runs collect + distribute branches and concats; 1x1 proj with
    padding=1 (the reference's quirk — spatial grows by 2 before the
    upsample), bilinear up to input, 3x3 bottleneck over
    [identity, psa], cls_seg."""
    mask_size: Sequence[int] = (97, 97)
    psa_type: str = 'bi-direction'
    compact: bool = False
    shrink_factor: int = 2
    normalization_factor: Optional[float] = 1.0
    psa_softmax: bool = True

    @nn.compact
    def __call__(self, inputs, train: bool = False, with_aux: bool = True):
        norm_cfg = self.norm_cfg or dict(type='BN')
        act_cfg = self.act_cfg or dict(type='ReLU')
        x = select_inputs(inputs, self.in_index, self.input_transform,
                          self.align_corners)
        identity = x
        in_ch = x.shape[-1]
        mh, mw = self.mask_size
        norm = self.normalization_factor
        if norm is None:
            norm = float(mh * mw)
        align_corners = self.align_corners

        h0, w0 = x.shape[1:3]
        h, w = h0, w0
        if self.shrink_factor != 1:
            # reference psa_head.py:122-135: only when BOTH dims have a
            # remainder does it ceil-divide and flip to align_corners=True
            if h % self.shrink_factor and w % self.shrink_factor:
                h = (h - 1) // self.shrink_factor + 1
                w = (w - 1) // self.shrink_factor + 1
                align_corners = True
            else:
                h = h // self.shrink_factor
                w = w // self.shrink_factor
                align_corners = False

        def reduce_shrink(name):
            r = ConvModule(in_ch, self.channels, 1, norm_cfg=norm_cfg,
                           act_cfg=act_cfg, name=name)(x, train=train)
            if (h, w) != (h0, w0):
                r = resize_bilinear(r, (h, w), align_corners)
            return r

        def attention(feat, name):
            a = ConvModule(self.channels, self.channels, 1, norm_cfg=norm_cfg,
                           act_cfg=act_cfg, name=f'{name}0')(feat, train=train)
            return nn.Conv(mh * mw, (1, 1), use_bias=False,
                           name=f'{name}1')(a)

        def apply_attn(feat, y_mat):
            """torch-layout bmm: out[b, j, c] = sum_i Y[i, j] feat[i, c]."""
            if self.psa_softmax:
                y_mat = nn.softmax(y_mat.astype(jnp.float32), axis=1)
            flat = feat.reshape(feat.shape[0], h * w, self.channels)
            out = jnp.einsum('bij,bic->bjc', y_mat,
                             flat.astype(y_mat.dtype)) * (1.0 / norm)
            return out.reshape(feat.shape[0], h, w,
                               self.channels).astype(feat.dtype)

        if self.psa_type in ('collect', 'distribute'):
            out = reduce_shrink('reduce')
            y = attention(out, 'attention')
            F = y.reshape(y.shape[0], h * w, mh * mw)  # [p, raw-channel]
            if self.compact:
                # compact needs mask_size == feature size; the raw channels
                # already index target positions (psa_head.py:137-141)
                y_mat = F if self.psa_type == 'collect' \
                    else F.transpose(0, 2, 1)
            else:
                A = psa_mask(y, (mh, mw))                # A[p, t]
                y_mat = A.transpose(0, 2, 1) \
                    if self.psa_type == 'collect' else A
            out = apply_attn(out, y_mat)
        else:  # bi-direction
            x_col = reduce_shrink('reduce')
            x_dis = reduce_shrink('reduce_p')
            y_col = attention(x_col, 'attention')
            y_dis = attention(x_dis, 'attention_p')
            Acol = psa_mask(y_col, (mh, mw))
            if self.compact:
                y_dis_mat = y_dis.reshape(y_dis.shape[0], h * w, mh * mw)
            else:
                y_dis_mat = psa_mask(y_dis, (mh, mw))
            out = jnp.concatenate(
                [apply_attn(x_col, Acol.transpose(0, 2, 1)),
                 apply_attn(x_dis, y_dis_mat)], axis=-1)

        out = ConvModule(out.shape[-1], in_ch, 1, padding=1,
                         norm_cfg=norm_cfg, act_cfg=act_cfg,
                         name='proj')(out, train=train)
        out = resize_bilinear(out, (h0, w0), align_corners)
        out = ConvModule(in_ch * 2, self.channels, 3, padding=1,
                         norm_cfg=norm_cfg, act_cfg=act_cfg,
                         name='bottleneck')(
            jnp.concatenate([identity, out], axis=-1), train=train)
        return ClsSeg(self.channels, self.num_out_channels,
                      self.dropout_ratio, name='cls')(out, train=train)


@MODELS.register_module()
class SETRMLAHead(_HeadBase):
    """SETR multi-level aggregation head."""
    mla_channels: int = 128
    up_scale: int = 4
    in_index: Sequence[int] = (0, 1, 2, 3)
    input_transform: Optional[str] = 'multiple_select'

    @nn.compact
    def __call__(self, inputs, train: bool = False, with_aux: bool = True):
        norm_cfg = self.norm_cfg or dict(type='BN')
        act_cfg = self.act_cfg or dict(type='ReLU')
        xs = select_inputs(inputs, self.in_index, 'multiple_select',
                           self.align_corners)
        outs = []
        for i, x in enumerate(xs):
            # no per-level LN here — MLANeck carries it
            # (reference setr_mla_head.py:32-53)
            h = ConvModule(x.shape[-1], self.mla_channels, 3, padding=1,
                           norm_cfg=norm_cfg, act_cfg=act_cfg,
                           name=f'conv{i}a')(x, train=train)
            h = ConvModule(self.mla_channels, self.mla_channels, 3, padding=1,
                           norm_cfg=norm_cfg, act_cfg=act_cfg,
                           name=f'conv{i}b')(h, train=train)
            h = resize_bilinear(h, (h.shape[1] * self.up_scale,
                                    h.shape[2] * self.up_scale),
                                self.align_corners)
            outs.append(h)
        out = jnp.concatenate(outs, axis=-1)
        return ClsSeg(out.shape[-1], self.num_out_channels,
                      self.dropout_ratio, name='cls')(out, train=train)


class _PreActRCU(nn.Module):
    """Pre-activation residual conv unit (reference ``dpt_head.py:100-147``):
    two (act -> 3x3 conv(bias=False) -> BN) layers + identity."""
    channels: int
    norm_cfg: Optional[Dict] = None
    act_cfg: Optional[Dict] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        norm_cfg = self.norm_cfg or dict(type='BN')
        act_cfg = self.act_cfg or dict(type='ReLU')
        h = ConvModule(self.channels, self.channels, 3, padding=1,
                       bias=False, norm_cfg=norm_cfg, act_cfg=act_cfg,
                       order=('act', 'conv', 'norm'),
                       name='conv1')(x, train=train)
        h = ConvModule(self.channels, self.channels, 3, padding=1,
                       bias=False, norm_cfg=norm_cfg, act_cfg=act_cfg,
                       order=('act', 'conv', 'norm'),
                       name='conv2')(h, train=train)
        return h + x


@MODELS.register_module(name='DPTHead')
class DPTHead(_HeadBase):
    """DPT head (reference ``dpt_head.py:216-294``): ReassembleBlocks
    (readout ignore/add/project, per-stage 1x1 projection + 4x/2x/1x/0.5x
    resample pyramid), 3x3 convs to ``channels``, top-down
    FeatureFusionBlocks of pre-act residual conv units with 2x upsampling
    (align_corners=True inside the fusion blocks), 3x3 project + cls_seg.
    Inputs are the ViT's ``(feature, cls_token)`` pairs
    (``output_cls_token=True``) or plain grids with readout 'ignore'."""
    embed_dims: int = 768
    post_process_channels: Sequence[int] = (96, 192, 384, 768)
    readout_type: str = 'ignore'
    patch_size: int = 16
    expand_channels: bool = False
    in_index: Sequence[int] = (0, 1, 2, 3)
    input_transform: Optional[str] = 'multiple_select'

    @nn.compact
    def __call__(self, inputs, train: bool = False, with_aux: bool = True):
        norm_cfg = self.norm_cfg or dict(type='BN')
        act_cfg = self.act_cfg or dict(type='ReLU')
        xs = [inputs[i] for i in self.in_index]

        # --- ReassembleBlocks (dpt_head.py:14-97) ---
        reassembled = []
        for i, item in enumerate(xs):
            if isinstance(item, (tuple, list)):
                x, cls_token = item
            else:
                x, cls_token = item, None
            B, H, W, C = x.shape
            if self.readout_type == 'project' and cls_token is not None:
                readout = jnp.broadcast_to(cls_token[:, None, None, :],
                                           x.shape)
                x = nn.Dense(C, name=f'readout{i}')(
                    jnp.concatenate([x, readout], axis=-1))
                x = nn.gelu(x, approximate=False)
            elif self.readout_type == 'add' and cls_token is not None:
                x = x + cls_token[:, None, None, :]
            ch = int(self.post_process_channels[i])
            x = ConvModule(C, ch, 1, act_cfg=None,
                           name=f'project{i}')(x, train=train)
            if i == 0:
                x = nn.ConvTranspose(ch, (4, 4), strides=(4, 4),
                                     padding=((3, 3), (3, 3)),
                                     transpose_kernel=True,
                                     name='resize0')(x)
            elif i == 1:
                x = nn.ConvTranspose(ch, (2, 2), strides=(2, 2),
                                     padding=((1, 1), (1, 1)),
                                     transpose_kernel=True,
                                     name='resize1')(x)
            elif i == 3:
                x = nn.Conv(ch, (3, 3), strides=(2, 2),
                            padding=((1, 1), (1, 1)), name='resize3')(x)
            reassembled.append(x)

        # expand_channels scales each stage by 2^i (dpt_head.py:253-256)
        chans = [int(c * 2 ** i) if self.expand_channels else int(c)
                 for i, c in enumerate(self.post_process_channels)]
        feats = [ConvModule(chans[i], self.channels, 3, padding=1,
                            bias=False, act_cfg=None,
                            name=f'conv{i}')(f, train=train)
                 for i, f in enumerate(reassembled)]

        # --- FeatureFusionBlocks, deepest first (dpt_head.py:150-293) ---
        out = None
        for i in range(len(feats)):
            x = feats[-1] if i == 0 else out
            if i > 0:
                res = feats[-(i + 1)]
                if res.shape[-3:-1] != x.shape[-3:-1]:
                    res = resize_bilinear(res, x.shape[-3:-1], False)
                x = x + _PreActRCU(self.channels, norm_cfg, act_cfg,
                                   name=f'fusion{i}_rcu1')(res, train=train)
            x = _PreActRCU(self.channels, norm_cfg, act_cfg,
                           name=f'fusion{i}_rcu2')(x, train=train)
            x = resize_bilinear(x, (x.shape[-3] * 2, x.shape[-2] * 2), True)
            out = ConvModule(self.channels, self.channels, 1, act_cfg=None,
                             name=f'fusion{i}_project')(x, train=train)

        out = ConvModule(self.channels, self.channels, 3, padding=1,
                         norm_cfg=norm_cfg, act_cfg=dict(type='ReLU'),
                         name='project')(out, train=train)
        return ClsSeg(self.channels, self.num_out_channels,
                      self.dropout_ratio, name='cls')(out, train=train)


@MODELS.register_module()
class SegmenterMaskTransformerHead(_HeadBase):
    """Segmenter (reference ``segmenter_mask_head.py:40-131``): project
    patches, append learned class embeddings, run transformer layers (with
    stochastic depth), decoder LN, L2-normalized patch/class projections,
    dot-product masks, LayerNorm over the class dimension (``mask_norm``)."""
    num_layers: int = 2
    num_heads: int = 6
    embed_dims: int = 192
    mlp_ratio: int = 4
    drop_path_rate: float = 0.1
    drop_rate: float = 0.0
    attn_drop_rate: float = 0.0
    qkv_bias: bool = True

    @nn.compact
    def __call__(self, inputs, train: bool = False, with_aux: bool = True):
        from lednet_tpu.models.backbones.vit import _MHSA
        from lednet_tpu.models.layers import DropPath
        x = select_inputs(inputs, self.in_index, self.input_transform,
                          self.align_corners)
        if isinstance(x, (list, tuple)):
            x = x[-1]
        B, H, W, C = x.shape
        d = self.embed_dims
        # tokens FIRST, class embeddings appended after (reference :117)
        tokens = nn.Dense(d, name='proj_input')(x).reshape(B, H * W, d)
        cls = self.param('cls_emb', nn.initializers.truncated_normal(0.02),
                         (1, self.num_classes, d), jnp.float32)
        cls = jnp.broadcast_to(cls, (B, self.num_classes, d)).astype(tokens.dtype)
        h = jnp.concatenate([tokens, cls], axis=1)
        dpr = [self.drop_path_rate * i / max(self.num_layers - 1, 1)
               for i in range(self.num_layers)]
        for i in range(self.num_layers):
            n1 = nn.LayerNorm(name=f'b{i}_norm1')(h)
            a = _MHSA(d, self.num_heads, self.qkv_bias, self.attn_drop_rate,
                      self.drop_rate, name=f'b{i}_attn')(n1, train=train)
            h = h + DropPath(dpr[i])(a, train=train)
            n2 = nn.LayerNorm(name=f'b{i}_norm2')(h)
            m = nn.Dense(d * self.mlp_ratio, name=f'b{i}_fc1')(n2)
            m = nn.Dense(d, name=f'b{i}_fc2')(nn.gelu(m, approximate=False))
            h = h + DropPath(dpr[i])(m, train=train)
        h = nn.LayerNorm(name='norm_out')(h)
        patches, cls_tok = h[:, :H * W], h[:, H * W:]
        patches = nn.Dense(d, use_bias=False, name='patch_proj')(patches)
        cls_tok = nn.Dense(d, use_bias=False, name='cls_proj')(cls_tok)
        patches = patches / jnp.maximum(
            jnp.linalg.norm(patches, axis=-1, keepdims=True), 1e-12)
        cls_tok = cls_tok / jnp.maximum(
            jnp.linalg.norm(cls_tok, axis=-1, keepdims=True), 1e-12)
        masks = jnp.einsum('bnd,bkd->bnk', patches, cls_tok)
        masks = nn.LayerNorm(name='mask_norm')(masks)
        return masks.reshape(B, H, W, self.num_classes)
