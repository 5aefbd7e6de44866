"""SAN — Side Adapter Network head for open-vocabulary segmentation.

Behavioral spec: reference ``mmseg/models/decode_heads/san_head.py``:

- ``MLPMaskDecoder`` (:27-96): query/pixel/attn-bias MLP branches;
  ``mask = einsum(q, pix)``, per-layer/per-head attention biases.
- ``SideAdapterNetwork`` (:97-263): a small ViT over the raw image with
  ``num_queries`` learned query tokens prepended; projected CLIP features
  are added onto the patch tokens at ``fusion_index`` layers; positional
  embeddings are re-added between blocks; deep-supervision taps feed the
  mask decoder.
- ``RecWithAttnbias`` (:274-468): the CLIP tower's last ``num_layers``
  blocks re-run over [sos tokens; cls; patch tokens] with an additive
  attention mask built from the (max-pooled) mask-decoder biases: sos
  tokens attend the image through the bias, nothing attends sos tokens,
  sos diag open; output sos embeddings are ln_post + proj + normalized.
- ``SideAdapterCLIPHead`` (:470-): class logits = einsum(sos embeddings,
  text embeddings); semantic map = softmax(cls)[:-1] x sigmoid(masks).

The mask BCE/Dice train on uncertainty-sampled points exactly as the
reference (``train_cfg.num_points=12544``, oversample 3.0, importance 0.75,
``san_vit-b16.py:102-104`` via mmdet — see ``ops/point_loss.py``);
``train_cfg=dict(num_points=0)`` falls back to dense full-mask losses.
Divergence (documented): Hungarian matching reuses this repo's
pure_callback matcher from the MaskFormer head, with a dense (not
point-sampled) matching cost.
"""
from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from lednet_tpu.models.decode_heads.base import sem_label
from lednet_tpu.models.decode_heads.maskformer_head import assign_queries
from lednet_tpu.ops.resize import resize_bilinear
from lednet_tpu.registry import MODELS


class _MLP(nn.Module):
    hidden: int
    out: int
    num_layers: int = 3

    @nn.compact
    def __call__(self, x):
        for i in range(self.num_layers - 1):
            x = nn.relu(nn.Dense(self.hidden, name=f'fc{i}')(x))
        return nn.Dense(self.out, name=f'fc{self.num_layers - 1}')(x)


class MLPMaskDecoder(nn.Module):
    total_heads: int = 12
    total_layers: int = 3
    embed_channels: int = 256
    mlp_channels: int = 256
    mlp_num_layers: int = 3

    @nn.compact
    def __call__(self, query, x):
        """query (B, Q, C); x (B, H, W, C) -> masks (B, Q, H, W),
        attn biases: list[num_layers] of (B, heads, Q, H, W)."""
        q = _MLP(self.mlp_channels, self.embed_channels,
                 self.mlp_num_layers, name='query_mlp')(query)
        pix = _MLP(self.mlp_channels, self.embed_channels,
                   self.mlp_num_layers, name='pix_mlp')(x)
        mask = jnp.einsum('bqc,bhwc->bqhw', q, pix,
                          preferred_element_type=jnp.float32).astype(x.dtype)
        attn = _MLP(self.mlp_channels,
                    self.embed_channels * self.total_heads * self.total_layers,
                    self.mlp_num_layers, name='attn_mlp')(x)
        B, H, W, _ = x.shape
        attn = attn.reshape(B, H, W, self.total_layers, self.total_heads,
                            self.embed_channels)
        bias = jnp.einsum('bqc,bhwlnc->blnqhw', q, attn,
                          preferred_element_type=jnp.float32).astype(x.dtype)
        return mask, [bias[:, i] for i in range(self.total_layers)]


class _SANBlock(nn.Module):
    dims: int
    num_heads: int
    mlp_ratio: int = 4

    @nn.compact
    def __call__(self, x):
        B, L, D = x.shape
        hd = D // self.num_heads
        h = nn.LayerNorm(name='ln_1')(x)
        q = nn.Dense(D, name='q')(h).reshape(B, L, self.num_heads, hd)
        k = nn.Dense(D, name='k')(h).reshape(B, L, self.num_heads, hd)
        v = nn.Dense(D, name='v')(h).reshape(B, L, self.num_heads, hd)
        a = nn.softmax(jnp.einsum('bqhd,bkhd->bhqk', q, k,
                                  preferred_element_type=jnp.float32)
                       * hd ** -0.5, axis=-1).astype(v.dtype)
        o = jnp.einsum('bhqk,bkhd->bqhd', a, v,
                       preferred_element_type=jnp.float32).astype(v.dtype)
        x = x + nn.Dense(D, name='proj')(o.reshape(B, L, D))
        h = nn.LayerNorm(name='ln_2')(x)
        m = nn.gelu(nn.Dense(self.mlp_ratio * D, name='fc1')(h), approximate=False)
        return x + nn.Dense(D, name='fc2')(m)


class SideAdapterNetwork(nn.Module):
    in_channels: int = 3
    clip_channels: int = 768
    embed_dims: int = 240
    patch_size: int = 16
    num_queries: int = 100
    num_encode_layer: int = 8
    num_heads: int = 6
    mlp_ratio: int = 4
    fusion_index: Sequence[int] = (0, 1, 2, 3)
    decoder_heads: int = 12
    decoder_layers: int = 3
    decoder_channels: int = 256
    pos_embed_size: int = 40  # reference inits at 640/16 and resizes

    @nn.compact
    def __call__(self, image, clip_features, deep_supervision_idxs=()):
        """image (B,H,W,3); clip_features: list of (feat NHWC, cls) pairs.
        Returns ([mask_preds], [attn_biases]) per supervision tap."""
        B = image.shape[0]
        P = self.patch_size
        x = nn.Conv(self.embed_dims, (P, P), strides=(P, P), padding='VALID',
                    use_bias=True, name='patch_embed')(image)
        gh, gw = x.shape[1], x.shape[2]
        L = gh * gw
        x = x.reshape(B, L, self.embed_dims)

        S = self.pos_embed_size
        pos = self.param('pos_embed', nn.initializers.normal(0.02),
                         (1, S * S, self.embed_dims))
        if (gh, gw) != (S, S):
            pos = jax.image.resize(pos.reshape(1, S, S, self.embed_dims),
                                   (1, gh, gw, self.embed_dims), 'bicubic'
                                   ).reshape(1, L, self.embed_dims)
        qpos = self.param('query_pos_embed', nn.initializers.normal(0.02),
                          (1, self.num_queries, self.embed_dims))
        qemb = self.param('query_embed', nn.initializers.normal(0.02),
                          (1, self.num_queries, self.embed_dims))
        full_pos = jnp.concatenate(
            [jnp.broadcast_to(qpos, (B, self.num_queries, self.embed_dims)),
             jnp.broadcast_to(pos, (B, L, self.embed_dims))], axis=1)
        x = jnp.concatenate(
            [jnp.broadcast_to(qemb, (B, self.num_queries, self.embed_dims)),
             x], axis=1)
        x = x + full_pos

        def fuse(i, x):
            feat = clip_features[i][0] if isinstance(clip_features[i],
                                                     (tuple, list)) \
                else clip_features[i]
            f = nn.LayerNorm(name=f'clip_ln{i}')(feat)
            f = nn.Conv(self.embed_dims, (1, 1), name=f'clip_proj{i}')(f)
            f = resize_bilinear(f, (gh, gw), False).reshape(B, L, -1)
            return jnp.concatenate([x[:, :-L], x[:, -L:] + f], axis=1)

        fused = 0
        if self.fusion_index[fused] == 0:
            x = fuse(fused, x)
            fused += 1

        decoder = MLPMaskDecoder(self.decoder_heads, self.decoder_layers,
                                 self.decoder_channels, self.decoder_channels,
                                 name='mask_decoder')
        masks, biases = [], []
        for index in range(1, self.num_encode_layer + 1):
            x = _SANBlock(self.embed_dims, self.num_heads, self.mlp_ratio,
                          name=f'layer{index - 1}')(x)
            if fused < len(self.fusion_index) and \
                    index == self.fusion_index[fused]:
                x = fuse(fused, x)
                fused += 1
            if index in deep_supervision_idxs or \
                    index == self.num_encode_layer:
                q = x[:, :-L]
                feat = x[:, -L:].reshape(B, gh, gw, self.embed_dims)
                m, b = decoder(q, feat)
                masks.append(m)
                biases.append(b)
            if index < self.num_encode_layer:
                x = x + full_pos
        return masks, biases


class RecWithAttnbias(nn.Module):
    sos_token_num: int = 100
    num_layers: int = 3
    embed_dims: int = 768
    num_heads: int = 12
    mlp_ratio: int = 4
    out_dims: int = 512
    final_norm: bool = True

    @nn.compact
    def __call__(self, biases, feature):
        """biases: list (per decoder layer) of (B, heads, Q, h', w');
        feature: (patch feat NHWC, cls token) from the CLIP tower."""
        feat, cls = feature
        B, H, W, C = feat.shape
        L = H * W
        Q = self.sos_token_num
        x = jnp.concatenate([cls[:, None], feat.reshape(B, L, C)], axis=1)
        sos = jnp.broadcast_to(cls[:, None], (B, Q, C))
        x = jnp.concatenate([sos, x], axis=1)  # (B, Q+1+L, C)

        # format biases: adaptive-max-pool to (H, W), build the additive
        # (Q+1+L)^2 mask: no one attends sos (except its own diag), sos
        # reads the image through the bias
        def fmt(bias):
            b, nh, q, hh, ww = bias.shape
            if (hh, ww) != (H, W):
                kh, kw = hh // H, ww // W
                bias = bias.reshape(b, nh, q, H, kh, W, kw).max((4, 6))
            bias = bias.reshape(b, nh, q, L)
            full = jnp.zeros((b, nh, Q + 1 + L, Q + 1 + L), bias.dtype)
            full = full.at[:, :, :, :Q].set(-100.0)
            diag = jnp.arange(Q)
            full = full.at[:, :, diag, diag].set(0.0)
            full = full.at[:, :, :Q, Q].set(-100.0)
            full = full.at[:, :, :Q, -L:].set(bias)
            return full

        fmt_biases = [fmt(b) for b in biases]
        if len(fmt_biases) == 1:
            fmt_biases = fmt_biases * self.num_layers

        for i in range(self.num_layers):
            x = self._block(x, fmt_biases[i], i)
        sos = x[:, :Q]
        sos = nn.LayerNorm(name='ln_post')(sos)
        sos = nn.Dense(self.out_dims, use_bias=False, name='proj')(sos)
        if self.final_norm:
            sos = sos / (jnp.linalg.norm(sos, axis=-1, keepdims=True) + 1e-12)
        return sos

    def _block(self, x, bias, i):
        B, N, D = x.shape
        hd = D // self.num_heads
        h = nn.LayerNorm(name=f'b{i}_ln1')(x)
        q = nn.Dense(D, name=f'b{i}_q')(h).reshape(B, N, self.num_heads, hd)
        k = nn.Dense(D, name=f'b{i}_k')(h).reshape(B, N, self.num_heads, hd)
        v = nn.Dense(D, name=f'b{i}_v')(h).reshape(B, N, self.num_heads, hd)
        a = jnp.einsum('bqhd,bkhd->bhqk', q, k,
                       preferred_element_type=jnp.float32) * hd ** -0.5
        a = nn.softmax(a + bias, axis=-1).astype(v.dtype)
        o = jnp.einsum('bhqk,bkhd->bqhd', a, v,
                       preferred_element_type=jnp.float32).astype(v.dtype)
        x = x + nn.Dense(D, name=f'b{i}_proj')(o.reshape(B, N, D))
        h = nn.LayerNorm(name=f'b{i}_ln2')(x)
        m = nn.gelu(nn.Dense(self.mlp_ratio * D, name=f'b{i}_fc1')(h), approximate=False)
        return x + nn.Dense(D, name=f'b{i}_fc2')(m)


@MODELS.register_module()
class SideAdapterCLIPHead(nn.Module):
    """SAN head. ``__call__((image, clip_feats, class_embeds))`` returns
    ([mask_props], [mask_logits]) in train mode; final pair in eval."""
    num_classes: int
    in_channels: int = 3
    clip_channels: int = 768
    embed_dims: int = 240
    num_queries: int = 100
    patch_size: int = 16
    num_encode_layer: int = 8
    num_san_heads: int = 6
    fusion_index: Sequence[int] = (0, 1, 2, 3)
    rec_num_layers: int = 3
    rec_num_heads: int = 12
    out_dims: int = 512
    deep_supervision_idxs: Sequence[int] = (7,)
    align_corners: bool = False
    ignore_index: int = 255
    loss_cls_weight: float = 2.0
    loss_mask_weight: float = 5.0
    loss_dice_weight: float = 5.0
    no_object_weight: float = 0.1
    loss_decode: Optional[Dict] = None  # accepted for config compat
    train_cfg: Optional[Dict] = None

    @property
    def num_out_channels(self) -> int:
        return self.num_classes

    @nn.compact
    def __call__(self, inputs, train: bool = False, with_aux: bool = True):
        image, clip_feats, class_embeds = inputs
        san = SideAdapterNetwork(
            self.in_channels, self.clip_channels, self.embed_dims,
            self.patch_size, self.num_queries, self.num_encode_layer,
            self.num_san_heads, 4, tuple(self.fusion_index),
            self.rec_num_heads, self.rec_num_layers,
            name='side_adapter_network')
        rec = RecWithAttnbias(self.num_queries, self.rec_num_layers,
                              self.clip_channels, self.rec_num_heads, 4,
                              self.out_dims, name='rec_with_attnbias')
        taps = tuple(self.deep_supervision_idxs) if train else ()
        masks, biases = san(image, clip_feats, taps)
        logits = []
        for bias in biases:
            sos = rec(bias, clip_feats[-1])
            logits.append(jnp.einsum('bqc,nc->bqn', sos, class_embeds,
                                     preferred_element_type=jnp.float32
                                     ).astype(sos.dtype))
        if train:
            return masks, logits
        return masks[-1], logits[-1]

    # -- loss / predict ----------------------------------------------------
    def loss_by_feat(self, outs, seg_label) -> Dict:
        all_masks, all_logits = outs
        label = sem_label(seg_label)
        out: Dict = {}
        for i, (mask_pred, cls_logit) in enumerate(zip(all_masks,
                                                       all_logits)):
            sub = self._single_loss(mask_pred, cls_logit, label)
            prefix = '' if i == len(all_masks) - 1 else f'd{i}.'
            for k, v in sub.items():
                out[prefix + k] = v
        return out

    def _single_loss(self, mask_pred, cls_logit, label) -> Dict:
        B, Q, h, w = mask_pred.shape
        C = self.num_classes
        small = jax.image.resize(
            jax.nn.one_hot(label, C, axis=-1), (B, h, w, C), 'nearest'
        ).transpose(0, 3, 1, 2)  # (B, C, h, w) binary GT class masks
        valid = (jax.image.resize(label.astype(jnp.float32)[..., None],
                                  (B, h, w, 1), 'nearest')[..., 0]
                 != self.ignore_index)
        small = small * valid[:, None]
        present = small.sum((-2, -1)) > 0  # (B, C)

        probs = jax.nn.sigmoid(mask_pred.astype(jnp.float32))
        # Hungarian cost: -cls_prob + mask bce + dice (host matcher)
        cls_prob = jax.nn.softmax(cls_logit.astype(jnp.float32), -1)
        inter = jnp.einsum('bqhw,bchw->bqc', probs, small)
        sums = probs.sum((-2, -1))[:, :, None] + small.sum((-2, -1))[:, None]
        dice_cost = 1 - (2 * inter + 1) / (sums + 1)
        cost = -cls_prob[..., :C] + self.loss_dice_weight * dice_cost
        assign = assign_queries(cost)

        take = jnp.take_along_axis  # (B, C, ...) gather of matched queries
        m_logit = take(mask_pred.astype(jnp.float32),
                       assign[..., None, None], axis=1)
        num_points = int((self.train_cfg or {}).get('num_points', 12544))
        if num_points > 0:
            # reference path (san_vit-b16.py:102-104 via mmdet): BCE/Dice on
            # uncertainty-sampled points, not the full mask grid; the dense
            # Hungarian cost above stays exact (it is no-grad)
            from lednet_tpu.ops.point_loss import sampled_mask_bce_dice
            rng = (self.make_rng('dropout')
                   if self.scope is not None and self.has_rng('dropout')
                   else jax.random.PRNGKey(0))
            cfg = self.train_cfg or {}
            bce, dice = sampled_mask_bce_dice(
                rng, m_logit.reshape(B * C, h, w),
                small.reshape(B * C, h, w), num_points,
                float(cfg.get('oversample_ratio', 3.0)),
                float(cfg.get('importance_sample_ratio', 0.75)))
            bce = bce.reshape(B, C)
            dice = dice.reshape(B, C)
        else:
            m_prob = jax.nn.sigmoid(m_logit)
            bce = -(small * jax.nn.log_sigmoid(m_logit) +
                    (1 - small) * jax.nn.log_sigmoid(-m_logit))
            bce = (bce * valid[:, None]).mean((-2, -1))
            inter_m = (m_prob * small).sum((-2, -1))
            dice = 1 - (2 * inter_m + 1) / (m_prob.sum((-2, -1)) +
                                            small.sum((-2, -1)) + 1)
        n_pos = jnp.maximum(present.sum(), 1)
        loss_mask = (bce * present).sum() / n_pos
        loss_dice = (dice * present).sum() / n_pos

        # classification: matched queries get the class, rest no-object
        target = jnp.full((B, Q), C, jnp.int32)
        cls_ids = jnp.broadcast_to(jnp.arange(C)[None], (B, C))
        target = jax.vmap(lambda t, a, c, p: t.at[a].set(
            jnp.where(p, c, t[a])))(target, assign, cls_ids, present)
        logp = jax.nn.log_softmax(cls_logit.astype(jnp.float32), -1)
        ce = -take(logp, target[..., None], axis=-1)[..., 0]
        weight = jnp.where(target == C, self.no_object_weight, 1.0)
        loss_cls = (ce * weight).sum() / weight.sum()
        return dict(loss_cls=self.loss_cls_weight * loss_cls,
                    loss_mask=self.loss_mask_weight * loss_mask,
                    loss_dice=self.loss_dice_weight * loss_dice)

    def predict_by_feat(self, outs, size=None):
        mask_pred, cls_logit = outs
        if size is not None:
            mask_pred = resize_bilinear(
                mask_pred.transpose(0, 2, 3, 1), size,
                self.align_corners).transpose(0, 3, 1, 2)
        cls_prob = jax.nn.softmax(cls_logit, axis=-1)[..., :-1]
        return jnp.einsum('bqc,bqhw->bhwc', cls_prob,
                          jax.nn.sigmoid(mask_pred))
