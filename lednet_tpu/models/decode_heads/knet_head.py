"""K-Net: iterative dynamic-kernel update head.

Behavioral spec: reference ``mmseg/models/decode_heads/knet_head.py``
(KernelUpdator :23-138, KernelUpdateHead :141-378, IterativeDecodeHead
:381-448) with ``conv_kernel_size=1`` — the setting every semantic-seg KNet
config uses. Semantics per stage:

1. binarize the previous stage's per-kernel masks (softmax over kernels,
   threshold ``hard_mask_thr``) and group features under each kernel:
   ``x_feat[b, n] = sum_hw mask[b, n, h, w] * x[b, h, w]``,
2. adaptively merge the grouped feature into the kernel (KernelUpdator's
   gated update — the LSTM-flavored ``G^f ⊙ K + G^i ⊙ F`` of the paper),
3. kernel interaction: multi-head self-attention + FFN over the kernel set,
4. re-convolve: ``new_mask = einsum(kernels, features)``.

The initial kernels ARE the 1x1 classifier weights of the kernel-generate
(FCN) head — held here as an explicit ``(C, N)`` param so the same tensor
serves as both ``conv_seg`` and stage-0 proposals.

TPU notes: kernels-as-activations means every stage is three batched matmuls
(group / update / re-mask) plus an N×N attention — all MXU; the hard masks
stay in the einsum (no gather), so shapes are static across stages and XLA
unrolls the ``num_stages`` loop into one fused program.
"""
from __future__ import annotations

from typing import Dict, Optional, Sequence, Union

import flax.linen as nn
import jax.numpy as jnp

from lednet_tpu.models.decode_heads.base import (build_losses,
                                                 default_loss_by_feat,
                                                 select_inputs)
from lednet_tpu.models.layers import ConvModule, kaiming_init
from lednet_tpu.ops.resize import resize_bilinear
from lednet_tpu.registry import MODELS


class KernelUpdator(nn.Module):
    """Gated kernel update (reference ``knet_head.py:23-138``)."""
    in_channels: int = 256
    feat_channels: int = 256

    @nn.compact
    def __call__(self, update_feature, input_feature):
        """update_feature: grouped mask features (B, N, Cin);
        input_feature: current kernels (B, N, Cin) -> new kernels."""
        F = self.feat_channels
        params = nn.Dense(2 * F, name='dynamic_layer')(update_feature)
        param_in, param_out = params[..., :F], params[..., F:]
        gates = nn.Dense(2 * F, name='input_layer')(input_feature)
        input_in, input_out = gates[..., :F], gates[..., F:]

        gate_feats = input_in * param_in
        input_gate = nn.sigmoid(nn.LayerNorm(name='input_norm_in')(
            nn.Dense(F, name='input_gate')(gate_feats)))
        update_gate = nn.sigmoid(nn.LayerNorm(name='norm_in')(
            nn.Dense(F, name='update_gate')(gate_feats)))

        param_out = nn.LayerNorm(name='norm_out')(param_out)
        input_out = nn.LayerNorm(name='input_norm_out')(input_out)
        feats = update_gate * param_out + input_gate * input_out
        feats = nn.Dense(self.in_channels, name='fc_layer')(feats)
        return nn.relu(nn.LayerNorm(name='fc_norm')(feats))


class KernelUpdateHead(nn.Module):
    """One refinement stage (reference ``knet_head.py:141-378``)."""
    in_channels: int = 256
    num_heads: int = 8
    feedforward_channels: int = 1024
    num_mask_fcs: int = 1
    hard_mask_thr: float = 0.5

    @nn.compact
    def __call__(self, x, kernels, mask_preds):
        """x (B, H, W, C) pixel features; kernels (B, N, C);
        mask_preds (B, H, W, N) -> (new_mask_preds, new_kernels)."""
        C = self.in_channels
        soft = nn.softmax(mask_preds, axis=-1)
        hard = (soft > self.hard_mask_thr).astype(x.dtype)
        x_feat = jnp.einsum('bhwn,bhwc->bnc', hard, x,
                            preferred_element_type=jnp.float32).astype(x.dtype)

        obj = KernelUpdator(C, C, name='kernel_update_conv')(x_feat, kernels)

        # kernel interaction: MHSA over the N kernels (post-norm, residual)
        B, N, _ = obj.shape
        hd = C // self.num_heads
        q = nn.Dense(C, name='attn_q')(obj).reshape(B, N, self.num_heads, hd)
        k = nn.Dense(C, name='attn_k')(obj).reshape(B, N, self.num_heads, hd)
        v = nn.Dense(C, name='attn_v')(obj).reshape(B, N, self.num_heads, hd)
        attn = nn.softmax(
            jnp.einsum('bqhd,bkhd->bhqk', q, k,
                       preferred_element_type=jnp.float32) * hd ** -0.5,
            axis=-1).astype(v.dtype)
        sa = jnp.einsum('bhqk,bkhd->bqhd', attn, v,
                        preferred_element_type=jnp.float32).astype(v.dtype)
        sa = nn.Dense(C, name='attn_proj')(sa.reshape(B, N, C))
        obj = nn.LayerNorm(name='attention_norm')(obj + sa)

        ffn = nn.Dense(C, name='ffn_fc2')(
            nn.relu(nn.Dense(self.feedforward_channels, name='ffn_fc1')(obj)))
        obj = nn.LayerNorm(name='ffn_norm')(obj + ffn)

        mask_feat = obj
        for i in range(self.num_mask_fcs):
            mask_feat = nn.relu(nn.LayerNorm(name=f'mask_norm{i}')(
                nn.Dense(C, use_bias=False, name=f'mask_fc{i}')(mask_feat)))
        mask_feat = nn.Dense(C, name='fc_mask')(mask_feat)

        new_mask = jnp.einsum('bnc,bhwc->bhwn', mask_feat, x,
                              preferred_element_type=jnp.float32
                              ).astype(x.dtype)
        return new_mask, obj


@MODELS.register_module()
class IterativeDecodeHead(nn.Module):
    """KNet-s3-style iterative head (reference ``knet_head.py:381-448``):
    an FCN kernel-generate head produces pixel features + stage-0 masks,
    then ``num_stages`` KernelUpdateHeads refine kernels and masks. Training
    returns the (num_stages + 1) stage logits; eval the final stage."""
    in_channels: Union[int, Sequence[int]]
    channels: int
    num_classes: int
    num_stages: int = 3
    num_convs: int = 2  # kernel-generate FCN depth
    num_heads: int = 8
    feedforward_channels: int = 1024
    num_mask_fcs: int = 1
    hard_mask_thr: float = 0.5
    dropout_ratio: float = 0.1
    norm_cfg: Optional[Dict] = None
    act_cfg: Optional[Dict] = None
    align_corners: bool = False
    ignore_index: int = 255
    in_index: Union[int, Sequence[int]] = -1
    input_transform: Optional[str] = None
    out_channels: Optional[int] = None
    loss_decode: Optional[Dict] = None
    # accepted for mmseg-config compatibility; stage params come from the
    # flat knobs above
    kernel_generate_head: Optional[Dict] = None
    kernel_update_head: Optional[Sequence[Dict]] = None
    init_cfg: Optional[Dict] = None

    @property
    def num_out_channels(self) -> int:
        return self.num_classes

    @nn.compact
    def __call__(self, inputs, train: bool = False, with_aux: bool = True):
        norm_cfg = self.norm_cfg or dict(type='BN')
        act_cfg = self.act_cfg or dict(type='ReLU')
        x = select_inputs(inputs, self.in_index, self.input_transform,
                          self.align_corners)
        feats = x
        for i in range(self.num_convs):
            feats = ConvModule(feats.shape[-1], self.channels, 3, padding=1,
                               norm_cfg=norm_cfg, act_cfg=act_cfg,
                               name=f'conv{i}')(feats, train=train)
        if train and self.dropout_ratio > 0:
            feats = nn.Dropout(self.dropout_ratio, deterministic=False)(feats)

        # conv_seg as an explicit (C, N) kernel so it doubles as the
        # stage-0 proposal kernels (reference ``knet_head.py:404-420``)
        seg_kernel = self.param('seg_kernel', kaiming_init,
                                (1, 1, self.channels, self.num_classes))
        seg_bias = self.param('seg_bias', nn.initializers.zeros,
                              (self.num_classes,))
        w = seg_kernel[0, 0]  # (C, N)
        mask = jnp.einsum('bhwc,cn->bhwn', feats, w) + seg_bias
        kernels = jnp.broadcast_to(w.T[None], (feats.shape[0],
                                               self.num_classes,
                                               self.channels))

        stage_masks = [mask]
        for s in range(self.num_stages):
            mask, kernels = KernelUpdateHead(
                self.channels, self.num_heads, self.feedforward_channels,
                self.num_mask_fcs, self.hard_mask_thr,
                name=f'kernel_update_head{s}')(feats, kernels, mask)
            stage_masks.append(mask)
        if train:
            return tuple(stage_masks)
        return stage_masks[-1]

    def loss_by_feat(self, seg_logits, seg_label) -> Dict:
        """Per-stage losses with ``s{i}.`` prefixes (reference
        ``knet_head.py:430-448``)."""
        losses = build_losses(self.loss_decode)
        out: Dict = {}
        logits_seq = seg_logits if isinstance(seg_logits, (tuple, list)) \
            else [seg_logits]
        for i, logits in enumerate(logits_seq):
            stage = default_loss_by_feat(logits, seg_label, losses,
                                         self.align_corners,
                                         self.ignore_index)
            for k, v in stage.items():
                out[f's{i}.{k}' if len(logits_seq) > 1 else k] = v
        return out

    def predict_by_feat(self, seg_logits, size=None):
        if isinstance(seg_logits, (tuple, list)):
            seg_logits = seg_logits[-1]
        if size is None:
            return seg_logits
        return resize_bilinear(seg_logits, size, self.align_corners)
