"""Context-aggregation decode heads (the reference's attention-head zoo).

Behavioral specs, one per class, from ``mmseg/models/decode_heads/``:
``gc_head.py`` (GCNet global-context block), ``dnl_head.py`` (disentangled
non-local), ``ema_head.py`` (expectation-maximization attention),
``isa_head.py`` (interlaced sparse self-attention), ``apc_head.py``
(adaptive context modules), ``dm_head.py`` (dynamic convolutional modules),
``ann_head.py`` (asymmetric fusion/pyramid non-local), ``setr_up_head.py``
(SETR progressive-upsample head), ``enc_head.py`` (context encoding module
with the SE-loss auxiliary).

All are single-logit heads sharing the ``_HeadBase`` loss/predict contract;
attention math runs as batched MXU matmuls (einsum) in f32.
"""
from __future__ import annotations

from typing import Dict, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from lednet_tpu.models.decode_heads.base import ClsSeg, select_inputs
from lednet_tpu.models.decode_heads.psp_aspp import _HeadBase
from lednet_tpu.models.layers import ConvModule, Norm2d, kaiming_init
from lednet_tpu.ops import adaptive_avg_pool2d
from lednet_tpu.ops.resize import resize_bilinear
from lednet_tpu.registry import MODELS


@MODELS.register_module()
class GCHead(_HeadBase):
    """FCN tail + GCNet context: softmax spatial pooling -> channel
    transform (1x1 -> LN -> ReLU -> 1x1) -> broadcast add."""
    ratio: float = 0.25
    pooling_type: str = 'att'
    fusion_types: Sequence[str] = ('channel_add',)

    @nn.compact
    def __call__(self, inputs, train: bool = False, with_aux: bool = True):
        norm_cfg = self.norm_cfg or dict(type='BN')
        act_cfg = self.act_cfg or dict(type='ReLU')
        x = select_inputs(inputs, self.in_index, self.input_transform,
                          self.align_corners)
        feats = ConvModule(x.shape[-1], self.channels, 3, padding=1,
                           norm_cfg=norm_cfg, act_cfg=act_cfg,
                           name='conv0')(x, train=train)
        B, H, W, C = feats.shape
        attn = nn.Conv(1, (1, 1), name='conv_mask')(feats).reshape(B, H * W)
        attn = nn.softmax(attn.astype(jnp.float32), axis=-1)
        ctx = jnp.einsum('bn,bnc->bc', attn,
                         feats.reshape(B, H * W, C).astype(jnp.float32))
        ctx = ctx.astype(feats.dtype)[:, None, None, :]
        mid = max(int(C * self.ratio), 1)
        t = nn.Conv(mid, (1, 1), name='transform1')(ctx)
        t = nn.LayerNorm(name='transform_ln')(t)
        t = nn.relu(t)
        t = nn.Conv(C, (1, 1), name='transform2')(t)
        feats = feats + t
        feats = ConvModule(C, self.channels, 3, padding=1, norm_cfg=norm_cfg,
                           act_cfg=act_cfg, name='conv1')(feats, train=train)
        return ClsSeg(self.channels, self.num_out_channels,
                      self.dropout_ratio, name='cls')(feats, train=train)


@MODELS.register_module()
class DNLHead(_HeadBase):
    """Disentangled non-local: whitened pairwise term + unary term."""
    reduction: int = 2
    use_scale: bool = True
    temperature: float = 0.05

    @nn.compact
    def __call__(self, inputs, train: bool = False, with_aux: bool = True):
        norm_cfg = self.norm_cfg or dict(type='BN')
        act_cfg = self.act_cfg or dict(type='ReLU')
        x = select_inputs(inputs, self.in_index, self.input_transform,
                          self.align_corners)
        feats = ConvModule(x.shape[-1], self.channels, 3, padding=1,
                           norm_cfg=norm_cfg, act_cfg=act_cfg,
                           name='conv0')(x, train=train)
        B, H, W, C = feats.shape
        inter = max(C // self.reduction, 1)
        flat = feats.reshape(B, H * W, C)
        theta = nn.Dense(inter, name='theta')(flat).astype(jnp.float32)
        phi = nn.Dense(inter, name='phi')(flat).astype(jnp.float32)
        g = nn.Dense(inter, name='g')(flat)
        # whiten (disentangle): subtract means
        theta = theta - theta.mean(axis=1, keepdims=True)
        phi = phi - phi.mean(axis=1, keepdims=True)
        attn = jnp.einsum('bnc,bmc->bnm', theta, phi)
        if self.use_scale:
            attn = attn / (inter ** 0.5)
        attn = nn.softmax(attn / self.temperature, axis=-1).astype(g.dtype)
        pairwise = jnp.einsum('bnm,bmc->bnc', attn, g)
        unary = nn.Conv(1, (1, 1), name='unary_mask')(feats).reshape(B, H * W)
        unary = nn.softmax(unary.astype(jnp.float32), axis=-1).astype(g.dtype)
        unary_ctx = jnp.einsum('bm,bmc->bc', unary, g)[:, None, :]
        y = pairwise + unary_ctx
        y = nn.Dense(C, name='out_proj')(y).reshape(B, H, W, C)
        feats = feats + y
        feats = ConvModule(C, self.channels, 3, padding=1, norm_cfg=norm_cfg,
                           act_cfg=act_cfg, name='conv1')(feats, train=train)
        return ClsSeg(self.channels, self.num_out_channels,
                      self.dropout_ratio, name='cls')(feats, train=train)


@MODELS.register_module()
class EMAHead(_HeadBase):
    """Expectation-maximization attention: iteratively refine K bases and
    reconstruct the feature from them."""
    ema_channels: int = 256
    num_bases: int = 64
    num_stages: int = 3
    momentum: float = 0.1

    @nn.compact
    def __call__(self, inputs, train: bool = False, with_aux: bool = True):
        norm_cfg = self.norm_cfg or dict(type='BN')
        act_cfg = self.act_cfg or dict(type='ReLU')
        x = select_inputs(inputs, self.in_index, self.input_transform,
                          self.align_corners)
        feats = ConvModule(x.shape[-1], self.ema_channels, 3, padding=1,
                           norm_cfg=norm_cfg, act_cfg=act_cfg,
                           name='ema_in')(x, train=train)
        B, H, W, C = feats.shape
        flat = feats.reshape(B, H * W, C).astype(jnp.float32)
        bases = self.param('bases', nn.initializers.normal(1.0),
                           (1, self.num_bases, C), jnp.float32)
        bases = jnp.broadcast_to(bases, (B, self.num_bases, C))
        bases = bases / (1e-6 + jnp.linalg.norm(bases, axis=-1,
                                                keepdims=True))

        def em_step(_, bases):
            attn = nn.softmax(jnp.einsum('bnc,bkc->bnk', flat, bases),
                              axis=-1)
            attn = attn / (1e-6 + attn.sum(axis=1, keepdims=True))
            new = jnp.einsum('bnk,bnc->bkc', attn, flat)
            return new / (1e-6 + jnp.linalg.norm(new, axis=-1, keepdims=True))

        bases = jax.lax.fori_loop(0, self.num_stages, em_step, bases)
        attn = nn.softmax(jnp.einsum('bnc,bkc->bnk', flat, bases), axis=-1)
        recon = jnp.einsum('bnk,bkc->bnc', attn, bases).astype(feats.dtype)
        recon = recon.reshape(B, H, W, C)
        recon = ConvModule(C, C, 1, norm_cfg=norm_cfg, act_cfg=None,
                           name='ema_mid')(recon, train=train)
        feats = nn.relu(feats + recon)
        feats = ConvModule(C, self.channels, 3, padding=1, norm_cfg=norm_cfg,
                           act_cfg=act_cfg, name='ema_out')(feats, train=train)
        return ClsSeg(self.channels, self.num_out_channels,
                      self.dropout_ratio, name='cls')(feats, train=train)


@MODELS.register_module()
class ISAHead(_HeadBase):
    """Interlaced sparse self-attention: long-range attention over strided
    groups then short-range attention within local blocks."""
    isa_channels: int = 256
    down_factor: Sequence[int] = (8, 8)

    def _attend(self, x, name):
        B, N, C = x.shape
        q = nn.Dense(C, name=f'{name}_q')(x).astype(jnp.float32)
        k = nn.Dense(C, name=f'{name}_k')(x).astype(jnp.float32)
        v = nn.Dense(C, name=f'{name}_v')(x)
        attn = nn.softmax(jnp.einsum('bnc,bmc->bnm', q, k) * C ** -0.5,
                          axis=-1).astype(v.dtype)
        return jnp.einsum('bnm,bmc->bnc', attn, v)

    @nn.compact
    def __call__(self, inputs, train: bool = False, with_aux: bool = True):
        norm_cfg = self.norm_cfg or dict(type='BN')
        act_cfg = self.act_cfg or dict(type='ReLU')
        x = select_inputs(inputs, self.in_index, self.input_transform,
                          self.align_corners)
        feats = ConvModule(x.shape[-1], self.isa_channels, 3, padding=1,
                           norm_cfg=norm_cfg, act_cfg=act_cfg,
                           name='in_conv')(x, train=train)
        B, H, W, C = feats.shape
        ph, pw = self.down_factor
        gh, gw = -(-H // ph), -(-W // pw)
        pad_h, pad_w = gh * ph - H, gw * pw - W
        h = jnp.pad(feats, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
        # long-range: group pixels with the same intra-block offset
        h = h.reshape(B, gh, ph, gw, pw, C)
        long_in = h.transpose(0, 2, 4, 1, 3, 5).reshape(B * ph * pw,
                                                        gh * gw, C)
        long_out = self._attend(long_in, 'long').reshape(B, ph, pw, gh, gw, C)
        # short-range: attention within each block
        short_in = long_out.transpose(0, 3, 4, 1, 2, 5).reshape(
            B * gh * gw, ph * pw, C)
        short_out = self._attend(short_in, 'short').reshape(B, gh, gw, ph,
                                                            pw, C)
        out = short_out.transpose(0, 1, 3, 2, 4, 5).reshape(
            B, gh * ph, gw * pw, C)[:, :H, :W]
        feats = jnp.concatenate([feats, out], axis=-1)
        feats = ConvModule(2 * C, self.channels, 1, norm_cfg=norm_cfg,
                           act_cfg=act_cfg, name='out_conv')(feats, train=train)
        return ClsSeg(self.channels, self.num_out_channels,
                      self.dropout_ratio, name='cls')(feats, train=train)


@MODELS.register_module()
class APCHead(_HeadBase):
    """Adaptive pyramid context: per-scale learned affinity between pixels
    and pooled region descriptors."""
    pool_scales: Sequence[int] = (1, 2, 3, 6)
    fusion: bool = True

    @nn.compact
    def __call__(self, inputs, train: bool = False, with_aux: bool = True):
        norm_cfg = self.norm_cfg or dict(type='BN')
        act_cfg = self.act_cfg or dict(type='ReLU')
        x = select_inputs(inputs, self.in_index, self.input_transform,
                          self.align_corners)
        B, H, W, _ = x.shape
        outs = []
        for s in self.pool_scales:
            pooled = adaptive_avg_pool2d(x, s)
            region = ConvModule(x.shape[-1], self.channels, 1,
                                norm_cfg=norm_cfg, act_cfg=act_cfg,
                                name=f'pool_proj{s}')(pooled, train=train)
            affinity = nn.Conv(s * s, (1, 1),
                               name=f'affinity{s}')(x).reshape(B, H * W,
                                                               s * s)
            affinity = nn.sigmoid(affinity)
            affinity = affinity / (1e-6 + affinity.sum(-1, keepdims=True))
            region_flat = region.reshape(B, s * s, self.channels)
            ctx = jnp.einsum('bnk,bkc->bnc', affinity.astype(jnp.float32),
                             region_flat.astype(jnp.float32))
            outs.append(ctx.astype(x.dtype).reshape(B, H, W, self.channels))
        out = jnp.concatenate([x] + outs, axis=-1)
        out = ConvModule(out.shape[-1], self.channels, 3, padding=1,
                         norm_cfg=norm_cfg, act_cfg=act_cfg,
                         name='bottleneck')(out, train=train)
        return ClsSeg(self.channels, self.num_out_channels,
                      self.dropout_ratio, name='cls')(out, train=train)


@MODELS.register_module()
class DMHead(_HeadBase):
    """Dynamic multi-scale filters: per-scale pooled dynamic kernels applied
    depthwise (reference ``dm_head.py`` DCM modules, fusion by concat)."""
    filter_sizes: Sequence[int] = (1, 3, 5, 7)
    fusion: bool = False

    @nn.compact
    def __call__(self, inputs, train: bool = False, with_aux: bool = True):
        norm_cfg = self.norm_cfg or dict(type='BN')
        act_cfg = self.act_cfg or dict(type='ReLU')
        x = select_inputs(inputs, self.in_index, self.input_transform,
                          self.align_corners)
        outs = []
        for k in self.filter_sizes:
            proj = ConvModule(x.shape[-1], self.channels, 1, norm_cfg=norm_cfg,
                              act_cfg=act_cfg, name=f'proj{k}')(x, train=train)
            # dynamic depthwise kernel from adaptive pooling (per-batch):
            kernel = adaptive_avg_pool2d(proj, k)           # (B,k,k,C)
            B, H, W, C = proj.shape
            pad = (k - 1) // 2

            def apply_one(img, ker):
                # depthwise: HWIO with I=1 per group
                return jax.lax.conv_general_dilated(
                    img[None], ker[:, :, None, :],
                    window_strides=(1, 1), padding=((pad, pad), (pad, pad)),
                    dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
                    feature_group_count=C)[0]

            ctx = jax.vmap(apply_one)(proj, kernel)
            ctx = Norm2d(norm_cfg, name=f'dyn_norm{k}')(ctx, train=train)
            outs.append(nn.relu(ctx))
        out = jnp.concatenate([x] + outs, axis=-1)
        out = ConvModule(out.shape[-1], self.channels, 3, padding=1,
                         norm_cfg=norm_cfg, act_cfg=act_cfg,
                         name='bottleneck')(out, train=train)
        return ClsSeg(self.channels, self.num_out_channels,
                      self.dropout_ratio, name='cls')(out, train=train)


@MODELS.register_module()
class ANNHead(_HeadBase):
    """Asymmetric non-local: key/value sampled at pyramid scales (APNB)."""
    project_channels: int = 256
    query_scales: Sequence[int] = (1,)
    key_pool_scales: Sequence[int] = (1, 3, 6, 8)
    in_index: Sequence[int] = (-2, -1)
    input_transform: Optional[str] = 'multiple_select'

    @nn.compact
    def __call__(self, inputs, train: bool = False, with_aux: bool = True):
        norm_cfg = self.norm_cfg or dict(type='BN')
        act_cfg = self.act_cfg or dict(type='ReLU')
        xs = select_inputs(inputs, self.in_index, 'multiple_select',
                           self.align_corners)
        low, high = xs[0], xs[-1]
        B, H, W, C = high.shape
        pc = self.project_channels
        # pyramid-pooled key/value bank from the high-level feature
        banks = [adaptive_avg_pool2d(high, s).reshape(B, -1, C)
                 for s in self.key_pool_scales]
        bank = jnp.concatenate(banks, axis=1)
        q = nn.Dense(pc, name='query')(high.reshape(B, H * W, C))
        k = nn.Dense(pc, name='key')(bank)
        v = nn.Dense(pc, name='value')(bank)
        attn = nn.softmax(
            jnp.einsum('bnc,bmc->bnm', q.astype(jnp.float32),
                       k.astype(jnp.float32)) * pc ** -0.5,
            axis=-1).astype(v.dtype)
        ctx = jnp.einsum('bnm,bmc->bnc', attn, v)
        ctx = nn.Dense(C, name='out_proj')(ctx).reshape(B, H, W, C)
        feats = high + ctx
        feats = ConvModule(C, self.channels, 3, padding=1, norm_cfg=norm_cfg,
                           act_cfg=act_cfg, name='bottleneck')(feats,
                                                               train=train)
        return ClsSeg(self.channels, self.num_out_channels,
                      self.dropout_ratio, name='cls')(feats, train=train)


@MODELS.register_module()
class SETRUPHead(_HeadBase):
    """SETR progressive-upsampling head: LN on the ViT grid, then
    (conv -> upsample xN) stages."""
    num_convs: int = 1
    up_scale: int = 4
    kernel_size: int = 3

    @nn.compact
    def __call__(self, inputs, train: bool = False, with_aux: bool = True):
        norm_cfg = self.norm_cfg or dict(type='BN')
        act_cfg = self.act_cfg or dict(type='ReLU')
        x = select_inputs(inputs, self.in_index, self.input_transform,
                          self.align_corners)
        x = nn.LayerNorm(name='ln')(x)
        in_ch = x.shape[-1]
        for i in range(self.num_convs):
            x = ConvModule(in_ch if i == 0 else self.channels, self.channels,
                           self.kernel_size, padding=self.kernel_size // 2,
                           norm_cfg=norm_cfg, act_cfg=act_cfg,
                           name=f'conv{i}')(x, train=train)
            x = resize_bilinear(x, (x.shape[1] * self.up_scale,
                                    x.shape[2] * self.up_scale),
                                self.align_corners)
        return ClsSeg(self.channels, self.num_out_channels,
                      self.dropout_ratio, name='cls')(x, train=train)


@MODELS.register_module()
class EncHead(_HeadBase):
    """Context-encoding head: learned codewords -> channel attention gate
    (+ optional SE auxiliary loss on predicted class presence)."""
    num_codes: int = 32
    use_se_loss: bool = True
    add_lateral: bool = False
    loss_se_decode: Optional[Dict] = None
    in_index: Sequence[int] = (0, 1, 2, 3)
    input_transform: Optional[str] = 'multiple_select'

    @nn.compact
    def __call__(self, inputs, train: bool = False, with_aux: bool = True):
        norm_cfg = self.norm_cfg or dict(type='BN')
        act_cfg = self.act_cfg or dict(type='ReLU')
        xs = select_inputs(inputs, self.in_index, 'multiple_select',
                           self.align_corners)
        x = ConvModule(xs[-1].shape[-1], self.channels, 3, padding=1,
                       norm_cfg=norm_cfg, act_cfg=act_cfg,
                       name='bottleneck')(xs[-1], train=train)
        B, H, W, C = x.shape
        codes = self.param('codewords', nn.initializers.uniform(1.0),
                           (self.num_codes, C), jnp.float32)
        scale = self.param('scale', nn.initializers.uniform(1.0),
                           (self.num_codes,), jnp.float32)
        flat = x.reshape(B, H * W, C).astype(jnp.float32)
        # soft-assignment encoding
        dist = jnp.sum((flat[:, :, None, :] - codes[None, None]) ** 2, -1)
        assign = nn.softmax(-scale * dist, axis=-1)
        enc = jnp.einsum('bnk,bnc->bkc', assign,
                         flat) - jnp.einsum('bnk,kc->bkc', assign, codes)
        enc = jnp.mean(enc, axis=1)  # (B, C)
        enc = nn.relu(nn.Dense(C, name='enc_fc')(enc.astype(x.dtype)))
        gamma = nn.sigmoid(enc)[:, None, None, :]
        feats = nn.relu(x * gamma + x)
        logits = ClsSeg(self.channels, self.num_out_channels,
                        self.dropout_ratio, name='cls')(feats, train=train)
        if self.use_se_loss:
            se_logit = nn.Dense(self.num_classes, name='se_layer')(
                enc.astype(x.dtype))
            return logits, se_logit
        return logits

    def loss_by_feat(self, seg_logits, seg_label) -> Dict:
        from lednet_tpu.models.decode_heads.base import (build_losses,
                                                         default_loss_by_feat,
                                                         sem_label)
        if isinstance(seg_logits, tuple):
            seg_logits, se_logit = seg_logits
        else:
            se_logit = None
        out = default_loss_by_feat(seg_logits, seg_label,
                                   build_losses(self.loss_decode),
                                   self.align_corners, self.ignore_index)
        if se_logit is not None:
            label = sem_label(seg_label)
            present = jax.vmap(
                lambda l: jnp.zeros(self.num_classes).at[
                    jnp.where(l != self.ignore_index, l, 0).reshape(-1)
                ].max(jnp.where(l != self.ignore_index, 1.0, 0.0).reshape(-1))
            )(label)
            x = se_logit.astype(jnp.float32)
            bce = jnp.maximum(x, 0) - x * present + \
                jnp.log1p(jnp.exp(-jnp.abs(x)))
            out['loss_se'] = 0.2 * jnp.mean(bce)
        return out

    def predict_by_feat(self, seg_logits, size=None):
        if isinstance(seg_logits, tuple):
            seg_logits = seg_logits[0]
        if size is None:
            return seg_logits
        return resize_bilinear(seg_logits, size, self.align_corners)


@MODELS.register_module()
class DAHead(_HeadBase):
    """Dual attention (DANet, reference ``da_head.py``): position attention
    (pixel-pixel affinity) + channel attention (channel-channel affinity)
    branches, fused by sum; predicts from pam, cam and the fusion (the
    reference returns a 3-logit tuple — losses on all, prediction on the
    fused one)."""
    pam_channels: int = 64

    @nn.compact
    def __call__(self, inputs, train: bool = False, with_aux: bool = True):
        norm_cfg = self.norm_cfg or dict(type='BN')
        act_cfg = self.act_cfg or dict(type='ReLU')
        x = select_inputs(inputs, self.in_index, self.input_transform,
                          self.align_corners)
        feats = ConvModule(x.shape[-1], self.channels, 3, padding=1,
                           norm_cfg=norm_cfg, act_cfg=act_cfg,
                           name='conv0')(x, train=train)
        B, H, W, C = feats.shape
        flat = feats.reshape(B, H * W, C)

        # position attention
        q = nn.Dense(self.pam_channels, name='pam_q')(flat)
        k = nn.Dense(self.pam_channels, name='pam_k')(flat)
        v = nn.Dense(C, name='pam_v')(flat)
        attn = nn.softmax(jnp.einsum('bnc,bmc->bnm', q.astype(jnp.float32),
                                     k.astype(jnp.float32)),
                          axis=-1).astype(v.dtype)
        pam_gamma = self.param('pam_gamma', nn.initializers.zeros, (),
                               jnp.float32)
        pam = flat + pam_gamma.astype(v.dtype) * \
            jnp.einsum('bnm,bmc->bnc', attn, v)
        pam = pam.reshape(B, H, W, C)

        # channel attention
        aff = jnp.einsum('bnc,bnd->bcd', flat.astype(jnp.float32),
                         flat.astype(jnp.float32))
        aff = nn.softmax(jnp.max(aff, -1, keepdims=True) - aff, axis=-1)
        cam_gamma = self.param('cam_gamma', nn.initializers.zeros, (),
                               jnp.float32)
        cam = flat + cam_gamma.astype(flat.dtype) * \
            jnp.einsum('bcd,bnd->bnc', aff.astype(flat.dtype), flat)
        cam = cam.reshape(B, H, W, C)

        pam = ConvModule(C, C, 3, padding=1, norm_cfg=norm_cfg,
                         act_cfg=act_cfg, name='pam_out')(pam, train=train)
        cam = ConvModule(C, C, 3, padding=1, norm_cfg=norm_cfg,
                         act_cfg=act_cfg, name='cam_out')(cam, train=train)
        fused = pam + cam
        pam_logit = ClsSeg(C, self.num_out_channels, self.dropout_ratio,
                           name='pam_cls')(pam, train=train)
        cam_logit = ClsSeg(C, self.num_out_channels, self.dropout_ratio,
                           name='cam_cls')(cam, train=train)
        logit = ClsSeg(C, self.num_out_channels, self.dropout_ratio,
                       name='cls')(fused, train=train)
        return logit, pam_logit, cam_logit

    def loss_by_feat(self, seg_logits, seg_label) -> Dict:
        from lednet_tpu.models.decode_heads.base import (build_losses,
                                                         default_loss_by_feat)
        logit, pam, cam = seg_logits
        losses = build_losses(self.loss_decode)
        out = default_loss_by_feat(logit, seg_label, losses,
                                   self.align_corners, self.ignore_index)
        for name, l in [('pam', pam), ('cam', cam)]:
            aux = default_loss_by_feat(l, seg_label, losses,
                                       self.align_corners, self.ignore_index)
            for k, v in aux.items():
                if 'loss' in k:
                    out[f'{name}_{k}'] = v
        return out

    def predict_by_feat(self, seg_logits, size=None):
        logit = seg_logits[0] if isinstance(seg_logits, tuple) else seg_logits
        if size is None:
            return logit
        return resize_bilinear(logit, size, self.align_corners)


@MODELS.register_module()
class CCHead(_HeadBase):
    """Criss-cross attention head (CCNet; the reference wraps mmcv's CUDA
    ``CrissCrossAttention`` — here it is two einsum attentions over each
    pixel's row and column, applied ``recurrence`` times)."""
    recurrence: int = 2

    def _cca(self, feats, name):
        B, H, W, C = feats.shape
        q = nn.Dense(C // 8, name=f'{name}_q')(feats).astype(jnp.float32)
        k = nn.Dense(C // 8, name=f'{name}_k')(feats).astype(jnp.float32)
        v = nn.Dense(C, name=f'{name}_v')(feats)
        # row attention: for each pixel, attend over its row (W) and column
        # (H) jointly (criss-cross footprint)
        row = jnp.einsum('bhwc,bhvc->bhwv', q, k)        # (B,H,W,W)
        col = jnp.einsum('bhwc,buwc->bhwu', q, k)        # (B,H,W,H)
        # the self pixel appears in both branches; the reference CCNet op
        # adds -inf on the column-branch diagonal so it is counted once
        self_mask = jnp.eye(H, dtype=bool)[None, :, None, :]  # u == h
        col = jnp.where(self_mask, -jnp.inf, col)
        attn = nn.softmax(jnp.concatenate([row, col], axis=-1), axis=-1)
        attn = attn.astype(v.dtype)
        a_row, a_col = attn[..., :W], attn[..., W:]
        out = jnp.einsum('bhwv,bhvc->bhwc', a_row, v) + \
            jnp.einsum('bhwu,buwc->bhwc', a_col, v)
        gamma = self.param(f'{name}_gamma', nn.initializers.zeros, (),
                           jnp.float32)
        return feats + gamma.astype(v.dtype) * out

    @nn.compact
    def __call__(self, inputs, train: bool = False, with_aux: bool = True):
        norm_cfg = self.norm_cfg or dict(type='BN')
        act_cfg = self.act_cfg or dict(type='ReLU')
        x = select_inputs(inputs, self.in_index, self.input_transform,
                          self.align_corners)
        feats = ConvModule(x.shape[-1], self.channels, 3, padding=1,
                           norm_cfg=norm_cfg, act_cfg=act_cfg,
                           name='conv0')(x, train=train)
        for r in range(self.recurrence):
            feats = self._cca(feats, f'cca{r}')
        feats = ConvModule(self.channels, self.channels, 3, padding=1,
                           norm_cfg=norm_cfg, act_cfg=act_cfg,
                           name='conv1')(feats, train=train)
        return ClsSeg(self.channels, self.num_out_channels,
                      self.dropout_ratio, name='cls')(feats, train=train)
