"""ESPNet-family blocks: SESP, EESP, down-samplers, and CESPB stages.

Behavioral spec from the reference ``mmseg/models/nn_layers/eesp.py:15-265``
and ``nn_layers/espnet_utils.py`` (CBR/CB/BR/CDilated bricks) plus the
supplementary PDF's module descriptions (SESP dual-branch dilated pyramid:
spatial dilations [1,1,1,1], context dilations [1,2,3,4]; CESPB = cascaded
SESP stage blocks):

- SESP: REDUCE (grouped 1x1 to nOut/k) -> SPLIT/TRANSFORM (k depthwise 3x3
  convs, dilation 1 for the spatial branch, 1..k for the context branch) with
  hierarchical feature fusion (branch_i += branch_{i-1}) -> optional second
  dilated depthwise stage (SESPV2, dilation d+1) -> MERGE (BN+PReLU on concat,
  grouped 1x1 expand) -> residual + per-channel PReLU.
- stride-2 context SESP adds an avg-pooled input shortcut
  (``eesp.py:110-111``).
- DownSampler: concat[avgpool(input), EESP(input, stride 2)] -> PReLU
  (``eesp.py:200-264``; we keep the channels-up concat path used by LED-Net).
- CESPB: a cascaded stage = one (optionally down-sampling) SESP/DownSampler
  followed by stride-1 SESP refinements.

Depthwise dilated convs are expressed as ``feature_group_count=channels``
convolutions, which XLA lowers to VPU-friendly elementwise windows.
"""
from __future__ import annotations

from typing import Dict, Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from lednet_tpu.models.layers import ConvModule, Norm2d, PReLU, kaiming_init
from lednet_tpu.ops import avg_pool2d


class _CBR(nn.Module):
    """conv + BN + PReLU (ESPNet's CBR brick)."""
    in_channels: int
    out_channels: int
    kernel_size: int = 3
    stride: int = 1
    groups: int = 1
    dilation: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        pad = (self.kernel_size // 2) * self.dilation
        x = nn.Conv(self.out_channels, (self.kernel_size, self.kernel_size),
                    strides=(self.stride, self.stride),
                    padding=((pad, pad), (pad, pad)),
                    kernel_dilation=(self.dilation, self.dilation),
                    feature_group_count=self.groups, use_bias=False,
                    kernel_init=kaiming_init, name='conv')(x)
        x = Norm2d(dict(type='BN'), name='norm')(x, train=train)
        return PReLU(self.out_channels, name='act')(x)


class _CB(nn.Module):
    """conv + BN (no activation)."""
    in_channels: int
    out_channels: int
    kernel_size: int = 1
    stride: int = 1
    groups: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        pad = self.kernel_size // 2
        x = nn.Conv(self.out_channels, (self.kernel_size, self.kernel_size),
                    strides=(self.stride, self.stride),
                    padding=((pad, pad), (pad, pad)),
                    feature_group_count=self.groups, use_bias=False,
                    kernel_init=kaiming_init, name='conv')(x)
        return Norm2d(dict(type='BN'), name='norm')(x, train=train)


def _dilation_schedule(k: int, spatial: bool, r_lim: int, spaspp: bool) -> Tuple[int, ...]:
    """Per-branch dilation rates (reference ``eesp.py:41-59``)."""
    if spaspp:
        # large-dilation SPASPP variant: kernel sizes 17/19/21/23
        table = {17: 6, 19: 12, 21: 18, 23: 24}
        return tuple(table[ks] for ks in (17, 19, 21, 23))
    if spatial:
        return tuple(1 for _ in range(k))
    rates = []
    for i in range(k):
        ksize = 3 + 2 * i
        ksize = ksize if ksize <= r_lim else 3
        rates.append((ksize - 1) // 2)
    return tuple(sorted(rates))


def _dw_shift(x, kernel, d: int, stride: int = 1):
    """3x3 depthwise dilated conv as 9 shifted multiply-adds.

    Numerically the same map as ``conv_general_dilated(...,
    feature_group_count=C)`` with SAME padding, but expressed as pure
    elementwise VPU work on the native NHWC layout: XLA's grouped-conv
    lowering on TPU promotes these to f32 with a T(1,128) layout and
    runs ~10x slower (honest chain-slope profile, docs/latency.md);
    the shift form fuses into neighbouring elementwise ops instead.
    """
    k = kernel.astype(x.dtype)
    H, W = x.shape[-3], x.shape[-2]
    oh = -(-H // stride)
    ow = -(-W // stride)
    xp = jnp.pad(x, ((0, 0), (d, d), (d, d), (0, 0)))
    out = None
    for ky in range(3):
        for kx in range(3):
            y0, x0 = ky * d, kx * d
            sl = xp[:, y0:y0 + (oh - 1) * stride + 1:stride,
                    x0:x0 + (ow - 1) * stride + 1:stride, :]
            term = sl * k[ky, kx, 0]
            out = term if out is None else out + term
    return out


def _embed_dilated(kernel, d: int, size: int):
    """Zero-embed a (3,3,1,n) depthwise kernel with dilation ``d`` into a
    dense (size,size,1,n) kernel (dilated conv == dense conv with zeros)."""
    import jax.numpy as jnp
    pad = (size - (2 * d + 1)) // 2
    out = jnp.zeros((size, size) + kernel.shape[2:], kernel.dtype)
    for ky in range(3):
        for kx in range(3):
            out = out.at[pad + ky * d, pad + kx * d].set(kernel[ky, kx])
    return out


class SESP(nn.Module):
    """SESP block (LED-Net's core primitive).

    ``fuse_branches=True`` runs the k dilated depthwise branches as ONE
    depthwise conv over a k-times channel-tiled input with dilation-embedded
    dense kernels — numerically identical (tested), but MEASURED SLOWER on
    v5e (the channel tile + dense 9x9 kernels cost more HBM/VPU time than
    the saved launches), so it stays off by default. Kept as a documented
    experiment; parameters are layout-compatible either way.
    """
    in_channels: int
    out_channels: int
    stride: int = 1
    k: int = 4
    r_lim: int = 7
    down_method: str = 'esp'
    spatial: bool = True
    spaspp: bool = False
    sespv2: bool = True
    fuse_branches: bool = False
    # 'shift' (default): 9 shifted multiply-adds, ~10x faster than XLA's
    # TPU grouped-conv lowering at these channel counts (see _dw_shift);
    # 'conv': the feature_group_count formulation (same parameters/math).
    dw_impl: str = 'pallas'
    # eval-only: blocks too wide for the Pallas kernel run as one dense
    # grouped conv when the map is tiny (launch-count bound); see __call__
    tiny_dense: bool = True

    def _fused_dw(self, x, kernels, rates, stride, extra_dil=0):
        """One depthwise conv over k-tiled channels; returns list of branch
        outputs (pre-HFF)."""
        import jax
        n = kernels[0].shape[-1]
        k = len(kernels)
        dmax = max(r + extra_dil for r in rates)
        size = 2 * dmax + 1
        big = jnp.concatenate(
            [_embed_dilated(kern.astype(x.dtype), d + extra_dil, size)
             for kern, d in zip(kernels, rates)], axis=-1)    # (S,S,1,k*n)
        tiled = jnp.tile(x, (1, 1, 1, k))
        pad = dmax
        out = jax.lax.conv_general_dilated(
            tiled, big, (stride, stride), ((pad, pad), (pad, pad)),
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
            feature_group_count=k * n)
        return [out[..., i * n:(i + 1) * n] for i in range(k)]

    @nn.compact
    def __call__(self, x, train: bool = False):
        import jax
        n = self.out_channels // self.k
        assert n * self.k == self.out_channels, \
            f'out_channels {self.out_channels} must divide k={self.k}'
        rates = _dilation_schedule(self.k, self.spatial, self.r_lim, self.spaspp)

        from lednet_tpu.ops.pallas.sesp_pyramid import (bn_fold, dense_grouped,
                                                        pyramid_fits,
                                                        sesp_block)
        # Fused path: TPU only (CPU tests and the multichip dryrun use the
        # shift form; the custom call is not GSPMD-partitionable either).
        use_fused = (self.dw_impl == 'pallas' and not train
                     and not self.is_initializing()
                     and not self.fuse_branches
                     and jax.default_backend() == 'tpu'
                     and pyramid_fits(x.shape[-3], x.shape[-2], n, self.k,
                                      x.dtype.itemsize, stride=self.stride,
                                      B=x.shape[0]))
        if use_fused:
            # Whole-block fused kernel (eval only). The submodules below are
            # not invoked; their parameters (created by the unfused path at
            # init) are read off this module's scope and folded (eval BN ->
            # affine; grouped 1x1 -> dense block-diagonal for the MXU).
            kerns = [self.param(f'spp_dw{i}', kaiming_init, (3, 3, 1, n),
                                jnp.float32) for i in range(self.k)]
            v2s = [self.param(f'spp_dw_v2_{i}', kaiming_init, (3, 3, 1, n),
                              jnp.float32) for i in range(self.k)] \
                if self.sespv2 else None
            P = lambda name: self.scope.get_variable('params', name)
            S = lambda name: self.scope.get_variable('batch_stats', name)
            pr, sr = P('proj_1x1'), S('proj_1x1')
            s1, b1 = bn_fold(pr['norm']['bn']['scale'],
                             pr['norm']['bn']['bias'],
                             sr['norm']['bn']['mean'], sr['norm']['bn']['var'])
            wred = dense_grouped(pr['conv']['kernel'], self.k) * s1[None]
            pn, sn = P('br_after_cat_norm'), S('br_after_cat_norm')
            s2, b2 = bn_fold(pn['bn']['scale'], pn['bn']['bias'],
                             sn['bn']['mean'], sn['bn']['var'])
            pe, se = P('conv_1x1_exp'), S('conv_1x1_exp')
            s3, b3 = bn_fold(pe['norm']['bn']['scale'],
                             pe['norm']['bn']['bias'],
                             se['norm']['bn']['mean'], se['norm']['bn']['var'])
            wexp = dense_grouped(pe['conv']['kernel'], self.k) * s3[None]
            if self.stride == 2:
                tail = 'plain'
            elif self.in_channels == self.out_channels:
                tail = 'residual'
            else:
                tail = 'act'
            a3 = (P('module_act')['alpha'] if tail != 'plain'
                  else jnp.zeros((self.out_channels,), jnp.float32))
            dw1 = jnp.stack([k_[..., 0, :] for k_ in kerns])
            dw2 = (jnp.stack([k_[..., 0, :] for k_ in v2s])
                   if self.sespv2 else None)
            out = sesp_block(
                x, wred.astype(x.dtype), b1, P('proj_1x1')['act']['alpha'],
                dw1, dw2, s2, b2, P('br_after_cat_act')['alpha'],
                wexp.astype(x.dtype), b3, a3,
                rates=tuple(rates), stride=self.stride, tail=tail,
                exact=(x.dtype == jnp.float32))
            if self.stride == 2 and not self.spatial \
                    and self.down_method != 'avg':
                out = out + avg_pool2d(x, 3, 2, 1)
            return out

        reduced = _CBR(self.in_channels, n, 1, groups=self.k,
                       name='proj_1x1')(x, train=train)

        # Launch-count fallback: blocks the Pallas kernel rejects (stride-2
        # with k*n > 128 lanes) otherwise run 9*k*2 shift ops — at the tiny
        # 1/32-scale maps where they live, per-op latency dominates
        # (context3/down: 161 ops, ~95 us of the 3.2 ms 720p forward,
        # docs/latency.md).  One dense grouped conv (numerically identical,
        # see class docstring) wins there; it stays off for larger maps
        # where its k-times channel tile costs real HBM.
        fuse = self.fuse_branches or (
            self.tiny_dense and not train and not self.is_initializing()
            and jax.default_backend() == 'tpu'
            and x.shape[-3] * x.shape[-2] <= 2048)
        if fuse:
            kernels = [self.param(f'spp_dw{i}', kaiming_init, (3, 3, 1, n),
                                  jnp.float32) for i in range(self.k)]
            outs = self._fused_dw(reduced, kernels, rates, self.stride)
            branches = []
            for b in outs:                       # hierarchical feature fusion
                branches.append(b + branches[-1] if branches else b)
            if self.sespv2:
                v2 = [self.param(f'spp_dw_v2_{i}', kaiming_init, (3, 3, 1, n),
                                 jnp.float32) for i in range(self.k)]
                # v2 convolves the HFF outputs: stack them as the tiled input
                stacked = jnp.concatenate(branches, axis=-1)
                dmax = max(r + 1 for r in rates)
                size = 2 * dmax + 1
                big = jnp.concatenate(
                    [_embed_dilated(kern.astype(x.dtype), d + 1, size)
                     for kern, d in zip(v2, rates)], axis=-1)
                import jax
                out = jax.lax.conv_general_dilated(
                    stacked, big, (1, 1), ((dmax, dmax), (dmax, dmax)),
                    dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
                    feature_group_count=self.k * n)
                branches = [out[..., i * n:(i + 1) * n]
                            for i in range(self.k)]
        else:
            import jax
            kerns = [self.param(f'spp_dw{i}', kaiming_init, (3, 3, 1, n),
                                jnp.float32) for i in range(self.k)]
            v2s = [self.param(f'spp_dw_v2_{i}', kaiming_init, (3, 3, 1, n),
                              jnp.float32) for i in range(self.k)] \
                if self.sespv2 else None

            # reference-shaped path: one (shift-)conv per branch
            def dw(inp, kern, d, stride=1):
                if self.dw_impl == 'conv':
                    return jax.lax.conv_general_dilated(
                        inp, kern.astype(inp.dtype), (stride, stride),
                        ((d, d), (d, d)), rhs_dilation=(d, d),
                        dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
                        feature_group_count=n)
                return _dw_shift(inp, kern, d, stride)

            branches = []
            for i, d in enumerate(rates):
                b = dw(reduced, kerns[i], d, self.stride)
                if branches:
                    b = b + branches[-1]
                branches.append(b)
            if self.sespv2:
                branches = [dw(b, v2s[i], d + 1)
                            for i, (b, d) in enumerate(zip(branches, rates))]

        merged = jnp.concatenate(branches, axis=-1)
        merged = Norm2d(dict(type='BN'), name='br_after_cat_norm')(merged, train=train)
        merged = PReLU(self.out_channels, name='br_after_cat_act')(merged)
        expanded = _CB(self.out_channels, self.out_channels, 1,
                       groups=self.k, name='conv_1x1_exp')(merged, train=train)

        if self.stride == 2 and self.down_method == 'avg':
            return expanded
        if self.stride == 2 and not self.spatial:
            return expanded + avg_pool2d(x, 3, 2, 1)
        if expanded.shape == x.shape:
            expanded = expanded + x
        return PReLU(self.out_channels, name='module_act')(expanded)


class ESPDownSampler(nn.Module):
    """Down-sampler: concat[avg-pool(x), SESP(x, stride 2, 'avg')] + PReLU.

    For ``out_channels > in_channels`` the SESP branch produces
    ``out - in`` channels so the concat lands exactly on ``out_channels``
    (reference ``eesp.py:220-253`` with ``Keep_channels_up``).
    """
    in_channels: int
    out_channels: int
    k: int = 4
    r_lim: int = 9
    spatial: bool = False
    dw_impl: str = 'pallas'
    tiny_dense: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        new_channels = self.out_channels - self.in_channels
        assert new_channels > 0, 'DownSampler expects out > in channels'
        avg_out = avg_pool2d(x, 3, 2, 1)
        esp_out = SESP(self.in_channels, new_channels, stride=2, k=self.k,
                       r_lim=self.r_lim, down_method='avg',
                       spatial=self.spatial, dw_impl=self.dw_impl,
                       tiny_dense=self.tiny_dense,
                       name='eesp')(x, train=train)
        out = jnp.concatenate([avg_out, esp_out], axis=-1)
        return PReLU(self.out_channels, name='act')(out)


class CESPB(nn.Module):
    """Cascaded ESP Block: one (down-sampling) SESP stage + refinements.

    The stage block of both LED-Net branches per the supplementary PDF §7:
    context stages down-sample (dilations 1..4), spatial stages keep
    resolution (dilations all 1).
    """
    in_channels: int
    out_channels: int
    stride: int = 1
    num_blocks: int = 1
    k: int = 4
    spatial: bool = True
    dw_impl: str = 'pallas'
    tiny_dense: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.stride == 2:
            x = ESPDownSampler(self.in_channels, self.out_channels, k=self.k,
                               spatial=self.spatial, dw_impl=self.dw_impl,
                               tiny_dense=self.tiny_dense,
                               name='down')(x, train=train)
        else:
            x = SESP(self.in_channels, self.out_channels, k=self.k,
                     spatial=self.spatial, dw_impl=self.dw_impl,
                     tiny_dense=self.tiny_dense,
                     name='block0')(x, train=train)
        for i in range(1, self.num_blocks):
            x = SESP(self.out_channels, self.out_channels, k=self.k,
                     spatial=self.spatial, dw_impl=self.dw_impl,
                     tiny_dense=self.tiny_dense,
                     name=f'block{i}')(x, train=train)
        return x
