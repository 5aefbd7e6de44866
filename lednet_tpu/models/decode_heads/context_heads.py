"""Context-aggregation decode heads (the reference's attention-head zoo).

Behavioral specs, one per class, from ``mmseg/models/decode_heads/``:
``gc_head.py`` (GCNet context block), ``dnl_head.py`` (disentangled
non-local), ``ema_head.py`` (expectation-maximization attention),
``isa_head.py`` (interlaced sparse self-attention), ``apc_head.py``
(adaptive context modules), ``dm_head.py`` (dynamic convolutional modules),
``ann_head.py`` (asymmetric fusion/pyramid non-local), ``setr_up_head.py``
(SETR progressive-upsample head), ``enc_head.py`` (context encoding module
with the SE-loss auxiliary), ``da_head.py`` (dual attention), plus the mmcv
blocks they wrap (``ContextBlock``, ``NonLocal2d``, ``Encoding``) and the
shared ``mmseg/models/utils/self_attention_block.py``.

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
from lednet_tpu.models.layers import ConvModule, Norm2d
from lednet_tpu.ops import adaptive_avg_pool2d
from lednet_tpu.ops.resize import resize_bilinear
from lednet_tpu.registry import MODELS


class SelfAttentionBlock(nn.Module):
    """General self-attention block mirroring the reference
    ``mmseg/models/utils/self_attention_block.py:34-160``.

    query/key projections are 1x1 ConvModules (with norm+act) when
    ``key_query_norm`` else plain convs; value/out are plain convs unless
    ``value_out_norm``. ``key_pool_scales`` reproduces ANN's ``PPMConcat``
    key/value downsampling (applied AFTER projection, as the reference does).
    """
    key_in_channels: int
    query_in_channels: int
    channels: int
    out_channels: int
    share_key_query: bool = False
    key_query_num_convs: int = 1
    key_query_norm: bool = False
    value_out_num_convs: int = 1
    value_out_norm: bool = False
    matmul_norm: bool = False
    with_out: bool = False
    key_pool_scales: Optional[Sequence[int]] = None
    norm_cfg: Optional[Dict] = None
    act_cfg: Optional[Dict] = None

    def _make_project(self, in_ch, out_ch, num_convs, use_conv_module, name):
        mods = []
        for i in range(num_convs):
            ic = in_ch if i == 0 else out_ch
            if use_conv_module:
                mods.append(ConvModule(ic, out_ch, 1, norm_cfg=self.norm_cfg,
                                       act_cfg=self.act_cfg,
                                       name=f'{name}{i}'))
            else:
                mods.append(nn.Conv(out_ch, (1, 1), name=f'{name}{i}'))

        def apply(x, train):
            for m in mods:
                x = m(x, train=train) if isinstance(m, ConvModule) else m(x)
            return x
        return apply

    def _ppm_concat(self, x):
        # PPMConcat (ann_head.py:11-30): adaptive pools flattened and
        # concatenated along the token axis
        B, _, _, C = x.shape
        return jnp.concatenate(
            [adaptive_avg_pool2d(x, s).reshape(B, -1, C)
             for s in self.key_pool_scales], axis=1)

    @nn.compact
    def __call__(self, query_feats, key_feats, train: bool = False):
        B, Hq, Wq, _ = query_feats.shape
        query_proj = self._make_project(
            self.query_in_channels, self.channels, self.key_query_num_convs,
            self.key_query_norm, 'query_project')
        key_proj = query_proj if self.share_key_query else \
            self._make_project(self.key_in_channels, self.channels,
                               self.key_query_num_convs, self.key_query_norm,
                               'key_project')
        query = query_proj(query_feats, train)
        key = key_proj(key_feats, train)
        value_ch = self.channels if self.with_out else self.out_channels
        value = self._make_project(
            self.key_in_channels, value_ch, self.value_out_num_convs,
            self.value_out_norm, 'value_project')(key_feats, train)
        if self.key_pool_scales is not None:
            k = self._ppm_concat(key)
            v = self._ppm_concat(value)
        else:
            k = key.reshape(B, -1, key.shape[-1])
            v = value.reshape(B, -1, value.shape[-1])
        q = query.reshape(B, Hq * Wq, self.channels)
        sim = jnp.einsum('bnc,bmc->bnm', q.astype(jnp.float32),
                         k.astype(jnp.float32))
        if self.matmul_norm:
            sim = sim * self.channels ** -0.5
        attn = nn.softmax(sim, axis=-1).astype(v.dtype)
        ctx = jnp.einsum('bnm,bmc->bnc', attn, v)
        ctx = ctx.reshape(B, Hq, Wq, value_ch)
        if self.with_out:
            ctx = self._make_project(
                value_ch, self.out_channels, self.value_out_num_convs,
                self.value_out_norm, 'out_project')(ctx, train)
        return ctx


def ema_iterate(flat, bases, num_stages):
    """The no-grad EM iterations of the reference ``EMAModule.forward``
    (``ema_head.py:45-66``): softmax responsibilities over bases, L1
    normalization over pixels, bases update, L2 normalization over
    channels. Returns the post-loop bases and the LAST iteration's
    (pre-update) attention, exactly as the reference pairs them."""

    def em_step(carry, _):
        b, _ = carry
        attn = nn.softmax(jnp.einsum('bnc,bkc->bnk', flat, b), axis=-1)
        # torch F.normalize(attention, dim=1, p=1)
        attn_n = attn / jnp.maximum(
            jnp.sum(jnp.abs(attn), axis=1, keepdims=True), 1e-12)
        new = jnp.einsum('bnk,bnc->bkc', attn_n, flat)
        new = new / jnp.maximum(
            jnp.linalg.norm(new, axis=-1, keepdims=True), 1e-12)
        return (new, attn), None

    B, N, _ = flat.shape
    K = bases.shape[1]
    (bases, attn), _ = jax.lax.scan(
        em_step, (bases, jnp.zeros((B, N, K), flat.dtype)),
        None, length=num_stages)
    return bases, attn


def cam_attention(flat):
    """DANet channel-attention affinity (``da_head.py:59-73``): channel
    gram matrix, max-subtracted, row-softmaxed, applied to the values."""
    aff = jnp.einsum('bnc,bnd->bcd', flat, flat)
    aff = nn.softmax(jnp.max(aff, -1, keepdims=True) - aff, axis=-1)
    return jnp.einsum('bcd,bnd->bnc', aff, flat)


def _fcn_tail(head, x, block_fn, train):
    """The FCNHead-derived forward shared by GC/NL/DNL (reference
    ``fcn_head.py:75-95`` + subclass forwards): convs[0] -> block ->
    convs[1] -> optional conv_cat on [input, output]."""
    norm_cfg = head.norm_cfg or dict(type='BN')
    act_cfg = head.act_cfg or dict(type='ReLU')
    out = ConvModule(x.shape[-1], head.channels, 3, padding=1,
                     norm_cfg=norm_cfg, act_cfg=act_cfg,
                     name='conv0')(x, train=train)
    out = block_fn(out)
    out = ConvModule(head.channels, head.channels, 3, padding=1,
                     norm_cfg=norm_cfg, act_cfg=act_cfg,
                     name='conv1')(out, train=train)
    if head.concat_input:
        out = ConvModule(x.shape[-1] + head.channels, head.channels, 3,
                         padding=1, norm_cfg=norm_cfg, act_cfg=act_cfg,
                         name='conv_cat')(
            jnp.concatenate([x, out], axis=-1), train=train)
    return out


@MODELS.register_module()
class GCHead(_HeadBase):
    """FCN tail + mmcv ``ContextBlock`` (reference ``gc_head.py``):
    softmax ('att') or GAP ('avg') spatial pooling -> channel transform
    (1x1 -> LN -> ReLU -> 1x1) -> broadcast add and/or sigmoid multiply."""
    ratio: float = 0.25
    pooling_type: str = 'att'
    fusion_types: Sequence[str] = ('channel_add',)
    concat_input: bool = True

    @nn.compact
    def __call__(self, inputs, train: bool = False, with_aux: bool = True):
        x = select_inputs(inputs, self.in_index, self.input_transform,
                          self.align_corners)

        def gc_block(feats):
            B, H, W, C = feats.shape
            if self.pooling_type == 'att':
                attn = nn.Conv(1, (1, 1), name='conv_mask')(feats)
                attn = nn.softmax(attn.reshape(B, H * W).astype(jnp.float32),
                                  axis=-1)
                ctx = jnp.einsum(
                    'bn,bnc->bc', attn,
                    feats.reshape(B, H * W, C).astype(jnp.float32))
                ctx = ctx.astype(feats.dtype)[:, None, None, :]
            else:
                ctx = adaptive_avg_pool2d(feats, 1)
            mid = max(int(C * self.ratio), 1)
            out = feats
            if 'channel_mul' in self.fusion_types:
                t = nn.Conv(mid, (1, 1), name='mul_transform1')(ctx)
                t = nn.LayerNorm(name='mul_transform_ln')(t)
                t = nn.Conv(C, (1, 1), name='mul_transform2')(nn.relu(t))
                out = out * nn.sigmoid(t)
            if 'channel_add' in self.fusion_types:
                t = nn.Conv(mid, (1, 1), name='transform1')(ctx)
                t = nn.LayerNorm(name='transform_ln')(t)
                t = nn.Conv(C, (1, 1), name='transform2')(nn.relu(t))
                out = out + t
            return out

        feats = _fcn_tail(self, x, gc_block, train)
        return ClsSeg(self.channels, self.num_out_channels,
                      self.dropout_ratio, name='cls')(feats, train=train)


@MODELS.register_module()
class DNLHead(_HeadBase):
    """FCN tail + mmcv ``DisentangledNonLocal2d`` (reference
    ``dnl_head.py``): whitened pairwise term + unary term, projected back
    with a normed 1x1 conv, residual add."""
    reduction: int = 2
    use_scale: bool = True
    temperature: float = 0.05
    concat_input: bool = True

    @nn.compact
    def __call__(self, inputs, train: bool = False, with_aux: bool = True):
        norm_cfg = self.norm_cfg or dict(type='BN')
        x = select_inputs(inputs, self.in_index, self.input_transform,
                          self.align_corners)

        def dnl_block(feats):
            B, H, W, C = feats.shape
            inter = max(C // self.reduction, 1)
            theta = nn.Conv(inter, (1, 1), name='theta')(feats).reshape(
                B, H * W, inter).astype(jnp.float32)
            phi = nn.Conv(inter, (1, 1), name='phi')(feats).reshape(
                B, H * W, inter).astype(jnp.float32)
            g = nn.Conv(inter, (1, 1), name='g')(feats).reshape(
                B, H * W, inter)
            # whiten (disentangle): subtract spatial means
            theta = theta - theta.mean(axis=1, keepdims=True)
            phi = phi - phi.mean(axis=1, keepdims=True)
            attn = jnp.einsum('bnc,bmc->bnm', theta, phi)
            if self.use_scale:
                attn = attn / (inter ** 0.5)
            attn = nn.softmax(attn / self.temperature, axis=-1).astype(g.dtype)
            pairwise = jnp.einsum('bnm,bmc->bnc', attn, g)
            unary = nn.Conv(1, (1, 1), name='conv_mask')(feats).reshape(
                B, H * W)
            unary = nn.softmax(unary.astype(jnp.float32),
                               axis=-1).astype(g.dtype)
            unary_ctx = jnp.einsum('bm,bmc->bc', unary, g)[:, None, :]
            y = (pairwise + unary_ctx).reshape(B, H, W, inter)
            # mmcv conv_out: 1x1 ConvModule with norm, no act
            y = ConvModule(inter, C, 1, norm_cfg=norm_cfg, act_cfg=None,
                           name='conv_out')(y, train=train)
            return feats + y

        feats = _fcn_tail(self, x, dnl_block, train)
        return ClsSeg(self.channels, self.num_out_channels,
                      self.dropout_ratio, name='cls')(feats, train=train)


@MODELS.register_module()
class EMAHead(_HeadBase):
    """Expectation-maximization attention head, exact reference structure
    (``ema_head.py:23-170``): frozen 1x1 mid conv, no-grad EM iterations
    with the LAST iteration's (pre-update) attention used for the
    reconstruction, a momentum-updated non-trainable bases buffer
    (batch-mean, cross-replica mean under pjit), relu -> normed 1x1 out
    conv -> residual relu -> bottleneck -> optional conv_cat."""
    ema_channels: int = 256
    num_bases: int = 64
    num_stages: int = 3
    momentum: float = 0.1
    concat_input: bool = True

    @nn.compact
    def __call__(self, inputs, train: bool = False, with_aux: bool = True):
        norm_cfg = self.norm_cfg or dict(type='BN')
        act_cfg = self.act_cfg or dict(type='ReLU')
        x = select_inputs(inputs, self.in_index, self.input_transform,
                          self.align_corners)
        feats = ConvModule(x.shape[-1], self.ema_channels, 3, padding=1,
                           norm_cfg=norm_cfg, act_cfg=act_cfg,
                           name='ema_in_conv')(x, train=train)
        identity = feats
        # ema_mid_conv: plain 1x1, requires_grad=False in the reference; its
        # only consumer is the no-grad EM module, so gradients never reach
        # it either way
        mid = ConvModule(self.ema_channels, self.ema_channels, 1,
                         norm_cfg=None, act_cfg=None,
                         name='ema_mid_conv')(feats, train=train)

        B, H, W, C = mid.shape
        K = self.num_bases

        def init_bases(key):
            b = jax.random.normal(key, (1, K, C)) * (2.0 / K) ** 0.5
            return b / jnp.maximum(
                jnp.linalg.norm(b, axis=-1, keepdims=True), 1e-12)

        bases_var = self.variable('batch_stats', 'bases', init_bases,
                                  self.make_rng('params')
                                  if self.is_initializing() else None)
        flat = jax.lax.stop_gradient(
            mid.reshape(B, H * W, C).astype(jnp.float32))
        bases = jnp.broadcast_to(bases_var.value, (B, K, C))
        bases, attn = ema_iterate(flat, bases, self.num_stages)
        # reference quirk: recon pairs the FINAL bases with the attention
        # computed BEFORE their final update (ema_head.py:55-66)
        recon = jnp.einsum('bnk,bkc->bnc', attn, bases).astype(feats.dtype)
        recon = recon.reshape(B, H, W, C)

        if train and not self.is_initializing() and \
                self.is_mutable_collection('batch_stats'):
            upd = jnp.mean(bases, axis=0, keepdims=True)
            upd = upd / jnp.maximum(
                jnp.linalg.norm(upd, axis=-1, keepdims=True), 1e-12)
            bases_var.value = (1 - self.momentum) * bases_var.value + \
                self.momentum * upd

        recon = nn.relu(recon)
        recon = ConvModule(C, C, 1, norm_cfg=norm_cfg, act_cfg=None,
                           name='ema_out_conv')(recon, train=train)
        out = nn.relu(identity + recon)
        out = ConvModule(C, self.channels, 3, padding=1, norm_cfg=norm_cfg,
                         act_cfg=act_cfg, name='bottleneck')(out, train=train)
        if self.concat_input:
            out = ConvModule(x.shape[-1] + self.channels, self.channels, 3,
                             padding=1, norm_cfg=norm_cfg, act_cfg=act_cfg,
                             name='conv_cat')(
                jnp.concatenate([x, out], axis=-1), train=train)
        return ClsSeg(self.channels, self.num_out_channels,
                      self.dropout_ratio, name='cls')(out, train=train)


@MODELS.register_module()
class ISAHead(_HeadBase):
    """Interlaced sparse self-attention (reference ``isa_head.py``):
    long-range attention over strided groups then short-range attention
    within local blocks, centered padding, cat with the residual."""
    isa_channels: int = 256
    down_factor: Sequence[int] = (8, 8)

    def _relation(self, x, name, train):
        # SelfAttentionBlock(channels, isa_channels): qk 2 normed convs,
        # plain value conv, matmul_norm, then a normed output projection
        ctx = SelfAttentionBlock(
            key_in_channels=self.channels, query_in_channels=self.channels,
            channels=self.isa_channels, out_channels=self.channels,
            key_query_num_convs=2, key_query_norm=True,
            value_out_num_convs=1, value_out_norm=False,
            matmul_norm=True, with_out=False,
            norm_cfg=self.norm_cfg or dict(type='BN'),
            act_cfg=self.act_cfg or dict(type='ReLU'),
            name=f'{name}_attn')(x, x, train=train)
        return ConvModule(self.channels, self.channels, 1,
                          norm_cfg=self.norm_cfg or dict(type='BN'),
                          act_cfg=self.act_cfg or dict(type='ReLU'),
                          name=f'{name}_out')(ctx, train=train)

    @nn.compact
    def __call__(self, inputs, train: bool = False, with_aux: bool = True):
        norm_cfg = self.norm_cfg or dict(type='BN')
        act_cfg = self.act_cfg or dict(type='ReLU')
        x = select_inputs(inputs, self.in_index, self.input_transform,
                          self.align_corners)
        feats = ConvModule(x.shape[-1], self.channels, 3, padding=1,
                           norm_cfg=norm_cfg, act_cfg=act_cfg,
                           name='in_conv')(x, train=train)
        residual = feats
        B, H, W, C = feats.shape
        lh, lw = self.down_factor
        gh, gw = -(-H // lh), -(-W // lw)
        pad_h, pad_w = gh * lh - H, gw * lw - W
        # centered padding (isa_head.py:112-115)
        h0, w0 = pad_h // 2, pad_w // 2
        h = jnp.pad(feats, ((0, 0), (h0, pad_h - h0), (w0, pad_w - w0),
                            (0, 0)))
        h = h.reshape(B, gh, lh, gw, lw, C)
        long_in = h.transpose(0, 2, 4, 1, 3, 5).reshape(B * lh * lw,
                                                        gh, gw, C)
        long_out = self._relation(long_in, 'global_relation', train)
        long_out = long_out.reshape(B, lh, lw, gh, gw, C)
        short_in = long_out.transpose(0, 3, 4, 1, 2, 5).reshape(
            B * gh * gw, lh, lw, C)
        short_out = self._relation(short_in, 'local_relation', train)
        short_out = short_out.reshape(B, gh, gw, lh, lw, C)
        out = short_out.transpose(0, 1, 3, 2, 4, 5).reshape(
            B, gh * lh, gw * lw, C)[:, h0:h0 + H, w0:w0 + W]
        out = ConvModule(2 * C, self.channels, 1, norm_cfg=norm_cfg,
                         act_cfg=act_cfg, name='out_conv')(
            jnp.concatenate([out, residual], axis=-1), train=train)
        return ClsSeg(self.channels, self.num_out_channels,
                      self.dropout_ratio, name='cls')(out, train=train)


@MODELS.register_module()
class APCHead(_HeadBase):
    """Adaptive pyramid context (reference ``apc_head.py`` ACM modules):
    sigmoid affinity (NOT normalized) between pixels (+global info) and
    pooled region descriptors, residual conv + relu, optional fusion conv."""
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
            pooled = ConvModule(x.shape[-1], self.channels, 1,
                                norm_cfg=norm_cfg, act_cfg=act_cfg,
                                name=f'acm{s}_pooled_redu')(pooled,
                                                            train=train)
            xr = ConvModule(x.shape[-1], self.channels, 1, norm_cfg=norm_cfg,
                            act_cfg=act_cfg,
                            name=f'acm{s}_input_redu')(x, train=train)
            glob = ConvModule(self.channels, self.channels, 1,
                              norm_cfg=norm_cfg, act_cfg=act_cfg,
                              name=f'acm{s}_global_info')(
                adaptive_avg_pool2d(xr, 1), train=train)
            gla_in = xr + resize_bilinear(glob, (H, W), self.align_corners)
            affinity = nn.Conv(s * s, (1, 1), name=f'acm{s}_gla')(
                gla_in).reshape(B, H * W, s * s)
            affinity = nn.sigmoid(affinity.astype(jnp.float32))
            region_flat = pooled.reshape(B, s * s,
                                         self.channels).astype(jnp.float32)
            z = jnp.einsum('bnk,bkc->bnc', affinity,
                           region_flat).astype(x.dtype)
            z = z.reshape(B, H, W, self.channels)
            z = ConvModule(self.channels, self.channels, 1, norm_cfg=norm_cfg,
                           act_cfg=act_cfg,
                           name=f'acm{s}_residual')(z, train=train)
            z = nn.relu(z + xr)
            if self.fusion:
                z = ConvModule(self.channels, self.channels, 1,
                               norm_cfg=norm_cfg, act_cfg=act_cfg,
                               name=f'acm{s}_fusion')(z, train=train)
            outs.append(z)
        out = jnp.concatenate([x] + outs, axis=-1)
        out = ConvModule(out.shape[-1], self.channels, 3, padding=1,
                         norm_cfg=norm_cfg, act_cfg=act_cfg,
                         name='bottleneck')(out, train=train)
        return ClsSeg(self.channels, self.num_out_channels,
                      self.dropout_ratio, name='cls')(out, train=train)


@MODELS.register_module()
class DMHead(_HeadBase):
    """Dynamic multi-scale filters (reference ``dm_head.py`` DCM modules):
    per-image depthwise kernels generated by a 1x1 conv on the pooled RAW
    input, applied to the reduced input with the reference's asymmetric
    padding for even filter sizes."""
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
            kernel = nn.Conv(self.channels, (1, 1),
                             name=f'dcm{k}_filter_gen')(
                adaptive_avg_pool2d(x, k))                     # (B,k,k,C)
            xr = ConvModule(x.shape[-1], self.channels, 1, norm_cfg=norm_cfg,
                            act_cfg=act_cfg,
                            name=f'dcm{k}_input_redu')(x, train=train)
            pad = (k - 1) // 2
            if (k - 1) % 2 == 0:
                hpad = wpad = (pad, pad)
            else:
                hpad = wpad = (pad + 1, pad)  # torch F.pad(pad+1, pad, ...)
            B, H, W, C = xr.shape
            padded = jnp.pad(xr, ((0, 0), hpad, wpad, (0, 0)))

            def apply_one(img, ker):
                return jax.lax.conv_general_dilated(
                    img[None], ker[:, :, None, :],
                    window_strides=(1, 1), padding='VALID',
                    dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
                    feature_group_count=C)[0]

            ctx = jax.vmap(apply_one)(padded, kernel)
            ctx = Norm2d(norm_cfg, name=f'dcm{k}_norm')(ctx, train=train)
            ctx = nn.relu(ctx)
            if self.fusion:
                ctx = ConvModule(self.channels, self.channels, 1,
                                 norm_cfg=norm_cfg, act_cfg=act_cfg,
                                 name=f'dcm{k}_fusion')(ctx, train=train)
            outs.append(ctx)
        out = jnp.concatenate([x] + outs, axis=-1)
        out = ConvModule(out.shape[-1], self.channels, 3, padding=1,
                         norm_cfg=norm_cfg, act_cfg=act_cfg,
                         name='bottleneck')(out, train=train)
        return ClsSeg(self.channels, self.num_out_channels,
                      self.dropout_ratio, name='cls')(out, train=train)


@MODELS.register_module()
class ANNHead(_HeadBase):
    """Asymmetric non-local (reference ``ann_head.py``): AFNB fusion of the
    low/high features (query=high, pooled key/value=low), dropout, 3x3
    bottleneck, then an APNB self-attention block, then cls_seg."""
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
        hc = high.shape[-1]
        pc = self.project_channels
        # AFNB: sum of per-query-scale attention outputs, then a 1x1
        # bottleneck (no act) on [context, high]
        ctx = 0.
        for qs in self.query_scales:
            q_in = high
            if qs > 1:
                q_in = nn.max_pool(high, (qs, qs), strides=(qs, qs))
            a = SelfAttentionBlock(
                key_in_channels=low.shape[-1], query_in_channels=hc,
                channels=pc, out_channels=hc, share_key_query=False,
                key_query_num_convs=1, key_query_norm=True,
                value_out_num_convs=1, value_out_norm=False,
                matmul_norm=True, with_out=True,
                key_pool_scales=self.key_pool_scales,
                norm_cfg=norm_cfg, act_cfg=act_cfg,
                name=f'fusion_q{qs}')(q_in, low, train=train)
            if qs > 1:
                # reference _SelfAttentionBlock resizes the downsampled-
                # query output back (self_attention_block.py forward)
                a = resize_bilinear(a, high.shape[-3:-1], False)
            ctx = ctx + a
        out = ConvModule(2 * hc, hc, 1, norm_cfg=norm_cfg, act_cfg=None,
                         name='fusion_bottleneck')(
            jnp.concatenate([ctx, high], axis=-1), train=train)
        if self.dropout_ratio > 0:
            out = nn.Dropout(self.dropout_ratio,
                             deterministic=not train)(out)
        out = ConvModule(hc, self.channels, 3, padding=1, norm_cfg=norm_cfg,
                         act_cfg=act_cfg, name='bottleneck')(out, train=train)
        # APNB: shared key/query projection self-attention on the
        # bottlenecked feature, 1x1 bottleneck (with act) on [context, x]
        ctx2 = 0.
        for qs in self.query_scales:
            q_in = out
            if qs > 1:
                q_in = nn.max_pool(out, (qs, qs), strides=(qs, qs))
            a = SelfAttentionBlock(
                key_in_channels=self.channels,
                query_in_channels=self.channels,
                channels=pc, out_channels=self.channels, share_key_query=True,
                key_query_num_convs=1, key_query_norm=True,
                value_out_num_convs=1, value_out_norm=False,
                matmul_norm=True, with_out=True,
                key_pool_scales=self.key_pool_scales,
                norm_cfg=norm_cfg, act_cfg=act_cfg,
                name=f'context_q{qs}')(q_in, out, train=train)
            if qs > 1:
                a = resize_bilinear(a, out.shape[-3:-1], False)
            ctx2 = ctx2 + a
        out = ConvModule(2 * self.channels, self.channels, 1,
                         norm_cfg=norm_cfg, act_cfg=act_cfg,
                         name='context_bottleneck')(
            jnp.concatenate([ctx2, out], axis=-1), train=train)
        return ClsSeg(self.channels, self.num_out_channels,
                      self.dropout_ratio, name='cls')(out, train=train)


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
    """Context-encoding head (reference ``enc_head.py`` + mmcv
    ``Encoding``): soft-assignment residual encoding with learnable
    codewords and per-codeword smoothing factors (init uniform(-1, 0), so
    ``softmax(scale * dist)`` decays with distance), BN-over-codes + ReLU,
    mean over codewords, Linear+sigmoid channel gate, and the SE auxiliary
    class-presence loss."""
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
        feat = ConvModule(xs[-1].shape[-1], self.channels, 3, padding=1,
                          norm_cfg=norm_cfg, act_cfg=act_cfg,
                          name='bottleneck')(xs[-1], train=train)
        if self.add_lateral:
            laterals = [
                resize_bilinear(
                    ConvModule(xs[i].shape[-1], self.channels, 1,
                               norm_cfg=norm_cfg, act_cfg=act_cfg,
                               name=f'lateral{i}')(xs[i], train=train),
                    feat.shape[1:3], self.align_corners)
                for i in range(len(xs) - 1)]
            feat = ConvModule(len(xs) * self.channels, self.channels, 3,
                              padding=1, norm_cfg=norm_cfg, act_cfg=act_cfg,
                              name='fusion')(
                jnp.concatenate([feat] + laterals, axis=-1), train=train)
        x = ConvModule(self.channels, self.channels, 1, norm_cfg=norm_cfg,
                       act_cfg=act_cfg,
                       name='encoding_project')(feat, train=train)
        B, H, W, C = x.shape
        K = self.num_codes
        std = 1.0 / (K * C) ** 0.5
        codes = self.param(
            'codewords',
            lambda key, shape: jax.random.uniform(key, shape, jnp.float32,
                                                  -std, std), (K, C))
        scale = self.param(
            'scale',
            lambda key, shape: jax.random.uniform(key, shape, jnp.float32,
                                                  -1.0, 0.0), (K,))
        flat = x.reshape(B, H * W, C).astype(jnp.float32)
        # mmcv Encoding: softmax over codes of scale * ||x - c_k||^2
        diff = flat[:, :, None, :] - codes[None, None]
        dist = jnp.sum(diff ** 2, -1)
        assign = nn.softmax(scale * dist, axis=-1)
        enc = jnp.einsum('bnk,bnkc->bkc', assign, diff)   # (B,K,C)
        enc = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                           axis=1, name='encoding_bn')(enc)
        enc = nn.relu(enc)
        encoding_feat = jnp.mean(enc, axis=1).astype(feat.dtype)  # (B,C)
        gamma = nn.sigmoid(nn.Dense(C, name='fc')(encoding_feat))
        out = nn.relu(feat + feat * gamma[:, None, None, :])
        logits = ClsSeg(self.channels, self.num_out_channels,
                        self.dropout_ratio, name='cls')(out, train=train)
        if self.use_se_loss:
            se_logit = nn.Dense(self.num_classes,
                                name='se_layer')(encoding_feat)
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
            weight = (self.loss_se_decode or {}).get('loss_weight', 0.2)
            out['loss_se'] = weight * jnp.mean(bce)
        return out

    def predict_by_feat(self, seg_logits, size=None):
        if isinstance(seg_logits, tuple):
            seg_logits = seg_logits[0]
        if size is None:
            return seg_logits
        return resize_bilinear(seg_logits, size, self.align_corners)


@MODELS.register_module()
class DAHead(_HeadBase):
    """Dual attention (DANet, reference ``da_head.py``): SEPARATE 3x3 in
    convs for the position (PAM) and channel (CAM) branches, plain-conv
    q/k/v projections without matmul scaling in PAM, the max-subtraction
    channel affinity in CAM, zero-init gamma residuals, per-branch out
    convs and classifiers; prediction uses the fused logit."""
    pam_channels: int = 64

    @nn.compact
    def __call__(self, inputs, train: bool = False, with_aux: bool = True):
        norm_cfg = self.norm_cfg or dict(type='BN')
        act_cfg = self.act_cfg or dict(type='ReLU')
        x = select_inputs(inputs, self.in_index, self.input_transform,
                          self.align_corners)

        # position attention branch
        pam_feat = ConvModule(x.shape[-1], self.channels, 3, padding=1,
                              norm_cfg=norm_cfg, act_cfg=act_cfg,
                              name='pam_in_conv')(x, train=train)
        B, H, W, C = pam_feat.shape
        flat = pam_feat.reshape(B, H * W, C)
        q = nn.Conv(self.pam_channels, (1, 1), name='pam_q')(
            pam_feat).reshape(B, H * W, self.pam_channels)
        k = nn.Conv(self.pam_channels, (1, 1), name='pam_k')(
            pam_feat).reshape(B, H * W, self.pam_channels)
        v = nn.Conv(C, (1, 1), name='pam_v')(pam_feat).reshape(B, H * W, C)
        attn = nn.softmax(jnp.einsum('bnc,bmc->bnm', q.astype(jnp.float32),
                                     k.astype(jnp.float32)),
                          axis=-1).astype(v.dtype)
        pam_gamma = self.param('pam_gamma', nn.initializers.zeros, (),
                               jnp.float32)
        pam = pam_gamma.astype(v.dtype) * \
            jnp.einsum('bnm,bmc->bnc', attn, v) + flat
        pam = pam.reshape(B, H, W, C)
        pam = ConvModule(C, C, 3, padding=1, norm_cfg=norm_cfg,
                         act_cfg=act_cfg, name='pam_out_conv')(pam,
                                                               train=train)

        # channel attention branch
        cam_feat = ConvModule(x.shape[-1], self.channels, 3, padding=1,
                              norm_cfg=norm_cfg, act_cfg=act_cfg,
                              name='cam_in_conv')(x, train=train)
        cflat = cam_feat.reshape(B, H * W, C)
        cam_gamma = self.param('cam_gamma', nn.initializers.zeros, (),
                               jnp.float32)
        cam = cam_gamma.astype(cflat.dtype) * cam_attention(
            cflat.astype(jnp.float32)).astype(cflat.dtype) + cflat
        cam = cam.reshape(B, H, W, C)
        cam = ConvModule(C, C, 3, padding=1, norm_cfg=norm_cfg,
                         act_cfg=act_cfg, name='cam_out_conv')(cam,
                                                               train=train)

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
    concat_input: bool = True

    @staticmethod
    def _cca(feats, q_proj, k_proj, v_proj, gamma):
        B, H, W, C = feats.shape
        q = q_proj(feats).astype(jnp.float32)
        k = k_proj(feats).astype(jnp.float32)
        v = v_proj(feats)
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
        return feats + gamma.astype(v.dtype) * out

    @nn.compact
    def __call__(self, inputs, train: bool = False, with_aux: bool = True):
        x = select_inputs(inputs, self.in_index, self.input_transform,
                          self.align_corners)

        def cc_block(feats):
            # the reference applies ONE CrissCrossAttention module
            # ``recurrence`` times (shared weights, cc_head.py forward);
            # the same flax submodules are reused across iterations
            C = feats.shape[-1]
            q_proj = nn.Dense(C // 8, name='cca_q')
            k_proj = nn.Dense(C // 8, name='cca_k')
            v_proj = nn.Dense(C, name='cca_v')
            gamma = self.param('cca_gamma', nn.initializers.zeros, (),
                               jnp.float32)
            for _ in range(self.recurrence):
                feats = self._cca(feats, q_proj, k_proj, v_proj, gamma)
            return feats

        feats = _fcn_tail(self, x, cc_block, train)
        return ClsSeg(self.channels, self.num_out_channels,
                      self.dropout_ratio, name='cls')(feats, train=train)
