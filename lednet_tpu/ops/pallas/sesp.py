"""Fused SESP dilated-depthwise pyramid as one Pallas TPU kernel.

The eval-mode SESP block (``models/espnet.py:178-206``; reference
``mmseg/models/nn_layers/eesp.py:60-140``) runs, per block:

    b_i   = dw3x3_{d_i}(x) + b_{i-1}        (k branches, HFF chaining)
    out_i = dw3x3_{d_i+1}(b_i)              (SESPV2 second stage)
    out   = concat_i(out_i)

— 8 depthwise convs + 3 adds + 1 concat = 12 XLA ops, each a full HBM
round-trip over a small (<=1/8-scale) feature map. The LED backbone is
launch/bandwidth-bound here, not FLOP-bound, so this kernel computes the
whole pyramid in VMEM: one read of x, one write of the concat.

Layout notes (hard-won): depthwise channels are fully independent, so the
kernel works on per-channel 2D planes with channels as a grid dimension —
(H, W) lands on (sublanes, lanes) with no padding blowup (channels-on-lanes
pads n=16..64 up to 128 lanes, 8x VMEM, OOM at LED sizes; channels-first
vector weights need a lane->sublane reshape Mosaic rejects). The 9 taps of
each 3x3 kernel are SMEM scalars; dilations are static Python ints, so
every shifted tap is a static slice of the halo-padded plane. Padding
semantics match composed same-padded convs: dw is evaluated on the true
region only and v2 reads the HFF result through fresh zero padding.
"""
from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pyramid_kernel(dw_ref, v2_ref, x_ref, out_ref, hff_ref, *,
                    rates: Tuple[int, ...], h1: int, h2: int,
                    height: int, width: int, nc: int):
    """dw/v2_ref SMEM (k, 3, 3, n) full; x_ref (1, nc, H+2*h1, W+2*h1);
    out_ref (1, k, nc, H, W) — ``nc`` channel planes per grid step;
    hff_ref: zero-bordered VMEM scratch (H+2*h2, W+2*h2) standing in for
    the inter-stage zero padding (jnp.pad lowers to a vector concat that
    Mosaic rejects once the operand carries sublane offsets)."""
    c0 = pl.program_id(1) * nc
    hff_ref[...] = jnp.zeros_like(hff_ref)

    for cc in range(nc):
        # accumulate in f32 (XLA's depthwise convs accumulate f32 even for
        # bf16 inputs; matching that keeps the kernel a drop-in replacement)
        x = x_ref[0, cc].astype(jnp.float32)
        hff = None
        for i, d in enumerate(rates):
            acc = None
            for ky in range(3):
                for kx in range(3):
                    w = dw_ref[i, ky, kx, c0 + cc].astype(jnp.float32)
                    y0 = h1 + (ky - 1) * d
                    x0 = h1 + (kx - 1) * d
                    term = w * x[y0:y0 + height, x0:x0 + width]
                    acc = term if acc is None else acc + term
            hff = acc if hff is None else hff + acc
            d2 = d + 1
            hff_ref[h2:h2 + height, h2:h2 + width] = hff
            out = None
            for ky in range(3):
                for kx in range(3):
                    w = v2_ref[i, ky, kx, c0 + cc].astype(jnp.float32)
                    y0 = h2 + (ky - 1) * d2
                    x0 = h2 + (kx - 1) * d2
                    term = w * hff_ref[y0:y0 + height, x0:x0 + width]
                    out = term if out is None else out + term
            out_ref[0, i, cc] = out.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=('rates',))
def sesp_pyramid(x, dw, v2, rates: Tuple[int, ...]):
    """Fused HFF + SESPV2 pyramid.

    x: (B, H, W, n) input (the SESP ``reduced`` tensor, stride 1);
    dw, v2: (k, 3, 3, n) depthwise kernels (branch i uses dilation
    ``rates[i]`` resp. ``rates[i] + 1``);
    returns (B, H, W, k*n), identical to the per-branch conv path.
    """
    B, H, W, n = x.shape
    k = len(rates)
    h1 = max(rates)
    h2 = max(rates) + 1

    xp = jnp.transpose(x, (0, 3, 1, 2))                      # (B, n, H, W)
    xp = jnp.pad(xp, ((0, 0), (0, 0), (h1, h1), (h1, h1)))

    nc = 8 if n % 8 == 0 else 1  # channels per grid step (unroll factor)

    out = pl.pallas_call(
        functools.partial(_pyramid_kernel, rates=tuple(rates), h1=h1, h2=h2,
                          height=H, width=W, nc=nc),
        grid=(B, n // nc),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, nc, H + 2 * h1, W + 2 * h1),
                         lambda b, c: (b, c, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, k, nc, H, W),
                               lambda b, c: (b, 0, c, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, k, n, H, W), x.dtype),
        scratch_shapes=[pltpu.VMEM((H + 2 * h2, W + 2 * h2), jnp.float32)],
    )(dw.astype(x.dtype), v2.astype(x.dtype), xp)

    # (B, k, n, H, W) -> NHWC with branch-major channel concat
    out = out.reshape(B, k * n, H, W)
    return jnp.transpose(out, (0, 2, 3, 1))


def sesp_pyramid_reference(x, dw, v2, rates: Sequence[int]):
    """Unfused conv formulation (mirrors ``espnet.py:178-206``) for tests."""
    branches = []
    for i, d in enumerate(rates):
        kern = dw[i][:, :, None, :]                           # (3,3,1,n)
        b = jax.lax.conv_general_dilated(
            x, kern.astype(x.dtype), (1, 1), ((d, d), (d, d)),
            rhs_dilation=(d, d), dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
            feature_group_count=x.shape[-1])
        if branches:
            b = b + branches[-1]
        branches.append(b)
    outs = []
    for i, (b, d) in enumerate(zip(branches, rates)):
        kern = v2[i][:, :, None, :]
        outs.append(jax.lax.conv_general_dilated(
            b, kern.astype(b.dtype), (1, 1),
            ((d + 1, d + 1), (d + 1, d + 1)), rhs_dilation=(d + 1, d + 1),
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
            feature_group_count=b.shape[-1]))
    return jnp.concatenate(outs, axis=-1)
