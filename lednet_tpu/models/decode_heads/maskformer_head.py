"""MaskFormer / Mask2Former decode heads (mask classification).

Behavioral spec: reference ``mmseg/models/decode_heads/maskformer_head.py`` /
``mask2former_head.py`` (which wrap mmdet's heads): a pixel decoder builds
per-pixel mask features; a transformer decoder refines N learned queries;
each query predicts a class (num_classes + no-object) and a mask (dot of the
query's mask embedding with the pixel features). Training uses Hungarian
matching between queries and the image's ground-truth class masks with
CE + mask BCE + Dice costs; semantic inference composes
``einsum(cls_probs[..., :-1], sigmoid(masks))``.

TPU-native formulation: for semantic segmentation the GT "instances" are the
<= num_classes binary class masks, a static bound, so the whole loss is
static-shape; the Hungarian assignment runs on host via
``jax.pure_callback`` on the (Q, C) cost matrix (scipy), exactly as the
reference rides mmdet's CPU matcher. Mask2FormerHead reuses the decoder with
masked cross-attention (attention restricted to the previous prediction's
foreground), without the deformable-attention pixel decoder (divergence
noted).
"""
from __future__ import annotations

from typing import Dict, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from lednet_tpu.models.decode_heads.base import select_inputs, sem_label
from lednet_tpu.models.decode_heads.psp_aspp import _HeadBase
from lednet_tpu.models.layers import ConvModule
from lednet_tpu.ops.resize import resize_bilinear
from lednet_tpu.registry import MODELS


def _hungarian(cost: np.ndarray) -> np.ndarray:
    """cost (B, Q, C) -> assignment (B, C): query index per class column."""
    from scipy.optimize import linear_sum_assignment
    B, Q, C = cost.shape
    out = np.zeros((B, C), np.int32)
    for b in range(B):
        rows, cols = linear_sum_assignment(cost[b])
        assign = np.zeros(C, np.int32)
        assign[cols] = rows
        out[b] = assign
    return out


def _greedy_assign(cost):
    """Device-native greedy assignment: repeatedly take the globally
    cheapest (query, class) pair and retire its row/column. Not provably
    optimal like scipy's Hungarian, but near-identical in practice for
    C <= Q semantic matching — used only where host callbacks are
    unavailable (the axon PJRT plugin rejects jax.pure_callback)."""
    B, Q, C = cost.shape
    big = jnp.asarray(1e9, cost.dtype)

    def body(_, state):
        cost, assign = state
        idx = jnp.argmin(cost.reshape(B, Q * C), axis=-1)
        q, c = idx // C, idx % C
        bidx = jnp.arange(B)
        assign = assign.at[bidx, c].set(q.astype(jnp.int32))
        cost = cost.at[bidx, q, :].set(big)
        cost = cost.at[bidx, :, c].set(big)
        return cost, assign

    assign = jnp.zeros((B, C), jnp.int32)
    _, assign = jax.lax.fori_loop(0, C, body, (cost, assign))
    return assign


_HOST_CALLBACKS = None


def _host_callbacks_supported() -> bool:
    """Probe once whether the runtime supports jax.pure_callback under jit
    (the axon-tunneled TPU plugin does not)."""
    global _HOST_CALLBACKS
    if _HOST_CALLBACKS is None:
        try:
            jax.jit(lambda x: jax.pure_callback(
                lambda a: a, jax.ShapeDtypeStruct((), np.float32), x))(
                    jnp.float32(0)).block_until_ready()
            _HOST_CALLBACKS = True
        except Exception:
            _HOST_CALLBACKS = False
    return _HOST_CALLBACKS


def assign_queries(cost):
    """(B, Q, C) cost -> (B, C) matched query per class: scipy Hungarian on
    host when callbacks work, greedy on device otherwise."""
    cost = jax.lax.stop_gradient(cost)
    if _host_callbacks_supported():
        return jax.pure_callback(
            _hungarian, jax.ShapeDtypeStruct(cost.shape[::2], jnp.int32),
            cost)
    return _greedy_assign(cost)


class _DecoderLayer(nn.Module):
    dim: int
    num_heads: int = 8
    masked_attn: bool = False

    @nn.compact
    def __call__(self, queries, memory, attn_mask=None):
        """queries (B, Q, D), memory (B, N, D), attn_mask (B, Q, N) bool
        (True = attend)."""
        B, Q, D = queries.shape
        hd = D // self.num_heads

        # cross attention
        h = nn.LayerNorm(name='norm_cross')(queries)
        q = nn.Dense(D, name='cq')(h).reshape(B, Q, self.num_heads, hd)
        k = nn.Dense(D, name='ck')(memory).reshape(B, -1, self.num_heads, hd)
        v = nn.Dense(D, name='cv')(memory).reshape(B, -1, self.num_heads, hd)
        attn = jnp.einsum('bqhd,bnhd->bhqn', q, k,
                          preferred_element_type=jnp.float32) * hd ** -0.5
        if self.masked_attn and attn_mask is not None:
            attn = jnp.where(attn_mask[:, None], attn, -1e9)
        attn = nn.softmax(attn, axis=-1).astype(v.dtype)
        out = jnp.einsum('bhqn,bnhd->bqhd', attn, v,
                         preferred_element_type=jnp.float32).astype(v.dtype)
        queries = queries + nn.Dense(D, name='cproj')(out.reshape(B, Q, D))

        # self attention
        h = nn.LayerNorm(name='norm_self')(queries)
        q = nn.Dense(D, name='sq')(h).reshape(B, Q, self.num_heads, hd)
        k = nn.Dense(D, name='sk')(h).reshape(B, Q, self.num_heads, hd)
        v = nn.Dense(D, name='sv')(h).reshape(B, Q, self.num_heads, hd)
        attn = nn.softmax(
            jnp.einsum('bqhd,bnhd->bhqn', q, k,
                       preferred_element_type=jnp.float32) * hd ** -0.5,
            axis=-1).astype(v.dtype)
        out = jnp.einsum('bhqn,bnhd->bqhd', attn, v,
                         preferred_element_type=jnp.float32).astype(v.dtype)
        queries = queries + nn.Dense(D, name='sproj')(out.reshape(B, Q, D))

        # FFN
        h = nn.LayerNorm(name='norm_ffn')(queries)
        m = nn.Dense(4 * D, name='fc1')(h)
        return queries + nn.Dense(D, name='fc2')(nn.gelu(m, approximate=False))


@MODELS.register_module()
class MaskFormerHead(_HeadBase):
    num_queries: int = 100
    num_transformer_decoder_layers: int = 6
    num_heads: int = 8
    feat_channels: int = 256
    out_channels: int = None  # type: ignore[assignment]
    masked_attn: bool = False
    in_index: Sequence[int] = (0, 1, 2, 3)
    input_transform: Optional[str] = 'multiple_select'
    loss_cls_weight: float = 2.0
    loss_mask_weight: float = 5.0
    loss_dice_weight: float = 5.0
    no_object_weight: float = 0.1
    # 'fpn' (TPU-first default) or 'msdeform' (mmdet's deformable-attention
    # pixel decoder — architectural parity, gather-bound on TPU)
    pixel_decoder: str = 'fpn'
    # point-sampled mask losses (mmdet convention: MaskFormer trains dense,
    # Mask2Former on 12544 uncertainty-sampled points)
    num_points: int = 0
    oversample_ratio: float = 3.0
    importance_sample_ratio: float = 0.75

    @nn.compact
    def __call__(self, inputs, train: bool = False, with_aux: bool = True):
        norm_cfg = self.norm_cfg or dict(type='GN', num_groups=32)
        xs = list(select_inputs(inputs, self.in_index, 'multiple_select',
                                self.align_corners))
        D = self.feat_channels

        assert self.pixel_decoder in ('fpn', 'msdeform'), \
            f"pixel_decoder must be 'fpn' or 'msdeform', got " \
            f"'{self.pixel_decoder}'"
        if self.pixel_decoder == 'msdeform':
            from lednet_tpu.models.decode_heads.deform_pixel_decoder import \
                MSDeformAttnPixelDecoder
            mask_features, memory = MSDeformAttnPixelDecoder(
                D, num_heads=self.num_heads,
                name='pixel_decoder')(xs, train=train)
        else:
            # pixel decoder: FPN laterals top-down to the finest level
            laterals = [ConvModule(x.shape[-1], D, 1, norm_cfg=norm_cfg,
                                   act_cfg=dict(type='ReLU'),
                                   name=f'lateral{i}')(x, train=train)
                        for i, x in enumerate(xs)]
            h = laterals[-1]
            for i in range(len(laterals) - 2, -1, -1):
                h = laterals[i] + resize_bilinear(h, laterals[i].shape[-3:-1],
                                                  self.align_corners)
                h = ConvModule(D, D, 3, padding=1, norm_cfg=norm_cfg,
                               act_cfg=dict(type='ReLU'),
                               name=f'fpn{i}')(h, train=train)
            mask_features = ConvModule(D, D, 3, padding=1, norm_cfg=None,
                                       act_cfg=None,
                                       name='mask_feat')(h, train=train)
            memory = laterals[-1]

        # transformer decoder over the coarsest memory
        B, mh, mw, _ = memory.shape
        mem_tokens = memory.reshape(B, mh * mw, D)
        queries = self.param('query_embed',
                             nn.initializers.truncated_normal(0.02),
                             (1, self.num_queries, D), jnp.float32)
        queries = jnp.broadcast_to(
            queries, (B, self.num_queries, D)).astype(memory.dtype)

        interm_embed = nn.Dense(D, name='interm_embed') \
            if self.masked_attn else None
        for li in range(self.num_transformer_decoder_layers):
            attn_mask = None
            if self.masked_attn:
                # restrict attention to the current prediction's foreground
                embed = interm_embed(queries)
                interm = jnp.einsum('bqd,bhwd->bqhw', embed, mask_features,
                                    preferred_element_type=jnp.float32)
                interm = resize_bilinear(
                    interm.transpose(0, 2, 3, 1), (mh, mw),
                    self.align_corners).transpose(0, 3, 1, 2)
                attn_mask = (jax.nn.sigmoid(interm.reshape(
                    B, self.num_queries, mh * mw)) > 0.5)
                attn_mask = jnp.logical_or(
                    attn_mask, ~jnp.any(attn_mask, -1, keepdims=True))
            queries = _DecoderLayer(D, self.num_heads, self.masked_attn,
                                    name=f'dec{li}')(queries, mem_tokens,
                                                     attn_mask)
        queries = nn.LayerNorm(name='dec_norm')(queries)

        cls_logits = nn.Dense(self.num_classes + 1, name='cls_embed')(queries)
        m = queries
        for i in range(2):
            m = nn.relu(nn.Dense(D, name=f'mask_mlp{i}')(m))
        mask_embed = nn.Dense(D, name='mask_embed')(m)
        mask_logits = jnp.einsum('bqd,bhwd->bqhw', mask_embed, mask_features,
                                 preferred_element_type=jnp.float32)
        return cls_logits, mask_logits

    # ---- losses ----------------------------------------------------------
    def loss_by_feat(self, seg_logits, seg_label) -> Dict:
        cls_logits, mask_logits = seg_logits          # (B,Q,C+1), (B,Q,h,w)
        label = sem_label(seg_label)
        B, Q = cls_logits.shape[:2]
        C = self.num_classes
        h, w = mask_logits.shape[2:]

        valid = label != self.ignore_index
        one_hot = jax.nn.one_hot(jnp.where(valid, label, 0), C) * \
            valid[..., None]
        gt = resize_bilinear(one_hot, (h, w), self.align_corners)   # soft ok
        gt = (gt > 0.5).astype(jnp.float32)                          # (B,h,w,C)
        present = jnp.any(gt > 0.5, axis=(1, 2))                     # (B,C)

        probs = jax.nn.softmax(cls_logits.astype(jnp.float32), -1)
        masks = mask_logits.astype(jnp.float32)
        sig = jax.nn.sigmoid(masks)
        gt_flat = gt.reshape(B, h * w, C)
        sig_flat = sig.reshape(B, Q, h * w)

        # costs
        cls_cost = -probs[..., :C]                                   # (B,Q,C)
        inter = jnp.einsum('bqn,bnc->bqc', sig_flat, gt_flat)
        dice_cost = 1 - (2 * inter + 1) / (
            sig_flat.sum(-1)[..., None] + gt_flat.sum(1)[:, None] + 1)
        bce_fg = -jnp.einsum('bqn,bnc->bqc',
                             jnp.log(jnp.clip(sig_flat, 1e-6)), gt_flat)
        bce_bg = -jnp.einsum('bqn,bnc->bqc',
                             jnp.log(jnp.clip(1 - sig_flat, 1e-6)),
                             1 - gt_flat)
        bce_cost = (bce_fg + bce_bg) / (h * w)
        cost = (self.loss_cls_weight * cls_cost +
                self.loss_dice_weight * dice_cost +
                self.loss_mask_weight * bce_cost)
        cost = jnp.where(present[:, None, :], cost, 1e6)

        assign = assign_queries(cost)                                # (B,C)

        # classification loss: matched queries get their class, others
        # no-object (weighted down)
        cls_target = jnp.full((B, Q), C, jnp.int32)
        batch_idx = jnp.arange(B)[:, None]
        cls_target = cls_target.at[batch_idx, assign].set(
            jnp.where(present, jnp.arange(C)[None], C))
        logp = jax.nn.log_softmax(cls_logits.astype(jnp.float32), -1)
        nll = -jnp.take_along_axis(logp, cls_target[..., None], -1)[..., 0]
        wts = jnp.where(cls_target == C, self.no_object_weight, 1.0)
        loss_cls = jnp.sum(nll * wts) / jnp.maximum(jnp.sum(wts), 1)

        # mask losses over matched (present) pairs
        pm = present.astype(jnp.float32)
        if self.num_points > 0:
            # Mask2Former (via mmdet): BCE/Dice on uncertainty-sampled
            # points (num_points=12544, oversample 3.0, importance 0.75)
            from lednet_tpu.ops.point_loss import sampled_mask_bce_dice
            rng = (self.make_rng('dropout')
                   if self.scope is not None and self.has_rng('dropout')
                   else jax.random.PRNGKey(0))
            m_logit = jnp.take_along_axis(
                masks, assign[:, :, None, None], axis=1)             # (B,C,h,w)
            gt_chw = gt.transpose(0, 3, 1, 2)                        # (B,C,h,w)
            bce, dice = sampled_mask_bce_dice(
                rng, m_logit.reshape(B * C, h, w),
                gt_chw.reshape(B * C, h, w), self.num_points,
                self.oversample_ratio, self.importance_sample_ratio)
            bce = bce.reshape(B, C)
            dice = dice.reshape(B, C)
            loss_dice = jnp.sum(dice * pm) / jnp.maximum(pm.sum(), 1)
            loss_mask = jnp.sum(bce * pm) / jnp.maximum(pm.sum(), 1)
        else:
            matched_masks = jnp.take_along_axis(
                sig_flat, assign[:, :, None], axis=1)                # (B,C,hw)
            gt_cm = gt_flat.transpose(0, 2, 1)                       # (B,C,hw)
            inter = jnp.sum(matched_masks * gt_cm, -1)
            dice = 1 - (2 * inter + 1) / (matched_masks.sum(-1) +
                                          gt_cm.sum(-1) + 1)
            loss_dice = jnp.sum(dice * pm) / jnp.maximum(pm.sum(), 1)
            bce = -(gt_cm * jnp.log(jnp.clip(matched_masks, 1e-6)) +
                    (1 - gt_cm) * jnp.log(jnp.clip(1 - matched_masks, 1e-6)))
            loss_mask = jnp.sum(bce.mean(-1) * pm) / \
                jnp.maximum(pm.sum(), 1)

        return {
            'loss_cls': self.loss_cls_weight * loss_cls,
            'loss_mask': self.loss_mask_weight * loss_mask,
            'loss_dice': self.loss_dice_weight * loss_dice,
        }

    def predict_by_feat(self, seg_logits, size=None):
        cls_logits, mask_logits = seg_logits
        probs = jax.nn.softmax(cls_logits.astype(jnp.float32), -1)[..., :-1]
        masks = jax.nn.sigmoid(mask_logits.astype(jnp.float32))
        sem = jnp.einsum('bqc,bqhw->bhwc', probs, masks)
        if size is not None:
            sem = resize_bilinear(sem, size, self.align_corners)
        return sem


@MODELS.register_module()
class Mask2FormerHead(MaskFormerHead):
    """Masked-attention variant with point-sampled mask losses (mmdet
    Mask2Former defaults); ``pixel_decoder='msdeform'`` opts into the
    deformable-attention pixel decoder, FPN is the TPU-first default."""
    masked_attn: bool = True
    num_points: int = 12544


