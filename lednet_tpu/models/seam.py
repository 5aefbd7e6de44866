"""SEAM — Laplacian edge-attention module.

Behavioral spec from the reference's standalone LED prototype
(``tools/speed/ddrnet_speed.py:88-93,282-338,388-389``) and the supplementary
PDF §4:

1. project the 1/8 stem feature to 1 channel (3x3 conv+BN), min-max normalize
   over the whole tensor,
2. fixed 3x3 Laplacian convolutions at strides 1/2/4 -> clamp(min=0) ->
   binarize at a threshold (0.1 fixed; PDF recommends the 80th percentile —
   available via ``adaptive_threshold``),
3. nearest-upsample the coarse maps, fuse the 3-level stack with the fixed
   kernel [0.6, 0.3, 0.1], binarize again,
4. re-project 1 -> C channels (3x3 conv+BN); the caller multiplies this into
   the spatial branch and adds it residually
   (``result = conv_2(seg) * x_s; x_s = result + x_s``).

The binarization is a hard step (zero gradient), matching the reference's
in-place masking semantics.
"""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from lednet_tpu.models.layers import ConvModule
from lednet_tpu.ops.resize import resize_nearest

_LAPLACIAN = np.array([[-1, -1, -1], [-1, 8, -1], [-1, -1, -1]], np.float32)
_FUSION = np.array([0.6, 0.3, 0.1], np.float32)


def _laplacian_conv(x, stride: int):
    """Fixed-kernel 3x3 conv, NHWC single channel, padding 1."""
    kernel = jnp.asarray(_LAPLACIAN, dtype=x.dtype).reshape(3, 3, 1, 1)
    return jax.lax.conv_general_dilated(
        x, kernel, window_strides=(stride, stride), padding=((1, 1), (1, 1)),
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'))


class SEAM(nn.Module):
    """Produces the C-channel edge-attention map from the stem feature."""
    channels: int
    boundary_threshold: float = 0.1
    adaptive_threshold: bool = False
    # None: fused eval on TPU only; True/False: force (tests)
    fused_eval: 'bool | None' = None

    def _fused_eval(self, x):
        """Eval-only channel-free formulation (TPU fast path).

        The reference pipeline runs on 1-channel maps; in NHWC that means
        every conv/binarize lives on a 128-lane tile with 1 live lane (the
        SEAM group cost ~170 us of the 3.2 ms 720p forward,
        docs/latency.md).  This path computes the SAME math on (B, H, W)
        planes (W in lanes):

        - conv_1 + BN folded into one conv, squeezed to a plane,
        - ONE full-resolution Laplacian via 9 zero-padded shifts; the
          stride-2/4 variants are exactly its ::2/::4 slices,
        - binarize / fuse elementwise on planes,
        - conv_2 + BN as 9 shifted outer products: stack the 9 shifts of
          the fused binary plane and contract (9 -> C) on the MXU.
        Bit-level caveat vs the conv form: the shift-sum adds the 9 taps in
        a fixed order, so f32 results can differ in the last ulp (the CPU
        suite keeps the conv path; ``tests/test_seam.py`` checks both).
        """
        from lednet_tpu.ops.pallas.sesp_pyramid import bn_fold
        P = lambda n: self.scope.get_variable('params', n)
        S = lambda n: self.scope.get_variable('batch_stats', n)
        dt = x.dtype
        p1, s1 = P('conv_1'), S('conv_1')
        sc1, bi1 = bn_fold(p1['norm']['bn']['scale'], p1['norm']['bn']['bias'],
                           s1['norm']['bn']['mean'], s1['norm']['bn']['var'])
        w1 = (p1['conv']['kernel'] * sc1[None, None, None]).astype(dt)
        proj = jax.lax.conv_general_dilated(
            x, w1, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'))[..., 0] \
            + bi1.astype(dt)[0]                                # (B, H, W)
        lo = jnp.min(proj, axis=(1, 2), keepdims=True)
        hi = jnp.max(proj, axis=(1, 2), keepdims=True)
        seg = (proj - lo) / (hi - lo + 1e-12)

        B, H, W = seg.shape
        segp = jnp.pad(seg, ((0, 0), (1, 1), (1, 1)))
        lap = 8.0 * seg
        for dy in (0, 1, 2):
            for dx in (0, 1, 2):
                if dy == 1 and dx == 1:
                    continue
                lap = lap - segp[:, dy:dy + H, dx:dx + W]
        lap = jnp.maximum(lap, 0)

        def binarize(t):
            if self.adaptive_threshold:
                thr = jnp.percentile(t.reshape(t.shape[0], -1), 80.0,
                                     axis=1).reshape(-1, 1, 1)
            else:
                thr = self.boundary_threshold
            return jnp.where(t > thr, 1.0, 0.0).astype(t.dtype)

        # nearest (legacy rounding) upsample of the plane maps, then
        # binarize — the reference order (matters for the adaptive
        # percentile, which sees the repeated samples)
        from lednet_tpu.ops.resize import _nearest_coords

        def up_plane(b):
            iy = jnp.asarray(_nearest_coords(H, b.shape[1]))
            ix = jnp.asarray(_nearest_coords(W, b.shape[2]))
            return jnp.take(jnp.take(b, iy, axis=1), ix, axis=2)

        b1 = binarize(lap)
        b2 = binarize(up_plane(lap[:, ::2, ::2]))
        b4 = binarize(up_plane(lap[:, ::4, ::4]))
        fused = binarize(float(_FUSION[0]) * b1 + float(_FUSION[1]) * b2
                         + float(_FUSION[2]) * b4)

        p2, s2 = P('conv_2'), S('conv_2')
        sc2, bi2 = bn_fold(p2['norm']['bn']['scale'], p2['norm']['bn']['bias'],
                           s2['norm']['bn']['mean'], s2['norm']['bn']['var'])
        w2 = (p2['conv']['kernel'][:, :, 0, :] * sc2[None, None]) \
            .reshape(9, -1).astype(dt)                         # (9, C)
        fp = jnp.pad(fused, ((0, 0), (1, 1), (1, 1)))
        taps = jnp.stack([fp[:, dy:dy + H, dx:dx + W]
                          for dy in (0, 1, 2) for dx in (0, 1, 2)], axis=-1)
        return jnp.einsum('bhwt,tc->bhwc', taps, w2) + bi2.astype(dt)

    @nn.compact
    def __call__(self, x, train: bool = False):
        use_fused = (not train and not self.is_initializing()
                     and (self.fused_eval if self.fused_eval is not None
                          else jax.default_backend() == 'tpu'))
        if use_fused:
            return self._fused_eval(x)
        proj = ConvModule(self.channels, 1, 3, padding=1,
                          norm_cfg=dict(type='BN'), act_cfg=None,
                          name='conv_1')(x, train=train)
        # PER-SAMPLE min-max normalization.  The reference prototype
        # normalizes over the whole tensor INCLUDING the batch axis, which
        # makes inference output depend on batch composition (bs=1 vs bs=8
        # disagree by O(0.7) logits — caught by the batched-val equality
        # test).  Per-sample is identical at bs=1 (the reference's val
        # protocol) and batch-invariant otherwise.
        lo = jnp.min(proj, axis=(1, 2, 3), keepdims=True)
        hi = jnp.max(proj, axis=(1, 2, 3), keepdims=True)
        seg = (proj - lo) / (hi - lo + 1e-12)

        def binarize(t):
            if self.adaptive_threshold:
                thr = jnp.percentile(t.reshape(t.shape[0], -1), 80.0,
                                     axis=1).reshape(-1, 1, 1, 1)
            else:
                thr = self.boundary_threshold
            return jnp.where(t > thr, 1.0, 0.0).astype(t.dtype)

        b1 = binarize(jnp.maximum(_laplacian_conv(seg, 1), 0))
        b2 = jnp.maximum(_laplacian_conv(seg, 2), 0)
        b4 = jnp.maximum(_laplacian_conv(seg, 4), 0)
        size = b1.shape[-3:-1]
        b2 = binarize(resize_nearest(b2, size))
        b4 = binarize(resize_nearest(b4, size))

        # python-float weights: numpy f32 scalars are strongly typed and
        # would promote the whole tail (and, via the edge-attention
        # multiply, the entire context branch) to f32 under bf16 inference
        fused = (float(_FUSION[0]) * b1 + float(_FUSION[1]) * b2
                 + float(_FUSION[2]) * b4)
        fused = binarize(fused)

        return ConvModule(1, self.channels, 3, padding=1,
                          norm_cfg=dict(type='BN'), act_cfg=None,
                          name='conv_2')(fused, train=train)
