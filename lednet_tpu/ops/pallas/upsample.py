"""Pallas TPU kernel: fused bilinear upsample + skip add, MXU-formulated.

The north star names the LED head's bilinear-upsample pyramid as a fusion
target (BASELINE.json). The pyramid (``led_head.py`` predict path) chains
half-pixel upsamples with skip additions on 2-channel logit maps; in NHWC
those maps put C=2 on the vector lanes (2/128 utilization) and each XLA
resize is a separate HBM round trip.

This kernel runs per (batch*channel) plane in (H, W) layout — W on lanes —
and expresses the separable interpolation as two *matmuls* with host-built
interpolation matrices (2 nonzeros per row):

    out = A_h @ x @ A_w^T + skip        (all in VMEM, MXU work)

which both fuses the skip add and moves the interpolation onto the systolic
array instead of gathers. Exactness: identical coordinates to
``ops/resize.py`` (torch half-pixel, no antialias).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from lednet_tpu.ops.resize import _linear_coords


def interp_matrix(out_size: int, in_size: int,
                  align_corners: bool = False) -> np.ndarray:
    i0, i1, w = _linear_coords(out_size, in_size, align_corners)
    m = np.zeros((out_size, in_size), np.float32)
    np.add.at(m, (np.arange(out_size), i0), 1.0 - w)
    np.add.at(m, (np.arange(out_size), i1), w)
    return m


def _kernel(mh_ref, mwt_ref, x_ref, skip_ref, out_ref):
    # precision=HIGHEST: f32 MXU passes, keeping logit parity with the
    # gather-based resize (default precision is bf16 passes)
    rows = jax.lax.dot(mh_ref[:], x_ref[0],
                       precision=jax.lax.Precision.HIGHEST,
                       preferred_element_type=jnp.float32)
    full = jax.lax.dot(rows, mwt_ref[:],
                       precision=jax.lax.Precision.HIGHEST,
                       preferred_element_type=jnp.float32)
    out_ref[0] = (full + skip_ref[0]).astype(out_ref.dtype)


def resize_add_planes(x, skip, align_corners: bool = False,
                      interpret: bool = False):
    """x: (N, H, W) -> bilinear to skip's (N, OH, OW), fused ``+ skip``."""
    N, H, W = x.shape
    OH, OW = skip.shape[1], skip.shape[2]
    mh = jnp.asarray(interp_matrix(OH, H, align_corners))
    mwt = jnp.asarray(interp_matrix(OW, W, align_corners).T)
    out_shape = jax.ShapeDtypeStruct((N, OH, OW), skip.dtype)
    flops = 2 * N * (OH * H * W + OH * OW * W)
    return pl.pallas_call(
        _kernel,
        out_shape=out_shape,
        grid=(N,),
        in_specs=[
            pl.BlockSpec((OH, H), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((W, OW), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H, W), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, OH, OW), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, OH, OW), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=4 * N * (H * W + 2 * OH * OW),
            transcendentals=0),
        interpret=interpret,
    )(mh, mwt, x, skip)


def _kernel_noskip(mh_ref, mwt_ref, x_ref, out_ref):
    rows = jax.lax.dot(mh_ref[:], x_ref[0],
                       precision=jax.lax.Precision.HIGHEST,
                       preferred_element_type=jnp.float32)
    full = jax.lax.dot(rows, mwt_ref[:],
                       precision=jax.lax.Precision.HIGHEST,
                       preferred_element_type=jnp.float32)
    out_ref[0] = full.astype(out_ref.dtype)


def resize_planes(x, out_hw, align_corners: bool = False,
                  interpret: bool = False):
    """x: (N, H, W) -> (N, OH, OW) bilinear via in-kernel matmuls."""
    N, H, W = x.shape
    OH, OW = out_hw
    mh = jnp.asarray(interp_matrix(OH, H, align_corners))
    mwt = jnp.asarray(interp_matrix(OW, W, align_corners).T)
    out_shape = jax.ShapeDtypeStruct((N, OH, OW), x.dtype)
    return pl.pallas_call(
        _kernel_noskip,
        out_shape=out_shape,
        grid=(N,),
        in_specs=[
            pl.BlockSpec((OH, H), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((W, OW), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H, W), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, OH, OW), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=2 * N * (OH * H * W + OH * OW * W),
            bytes_accessed=4 * N * (H * W + OH * OW), transcendentals=0),
        interpret=interpret,
    )(mh, mwt, x)


def resize_add_nhwc(x, skip, align_corners: bool = False,
                    interpret: bool = False):
    """NHWC fused resize-to-skip + add; channels fold onto the plane grid so
    narrow logit maps still fill the lanes."""
    B, H, W, C = x.shape
    OB, OH, OW, OC = skip.shape
    assert (B, C) == (OB, OC), (x.shape, skip.shape)
    xp = x.transpose(0, 3, 1, 2).reshape(B * C, H, W).astype(jnp.float32)
    sp = skip.transpose(0, 3, 1, 2).reshape(B * C, OH, OW).astype(jnp.float32)
    out = resize_add_planes(xp, sp, align_corners, interpret=interpret)
    return out.reshape(B, C, OH, OW).transpose(0, 2, 3, 1).astype(skip.dtype)


def resize_nhwc(x, out_hw, align_corners: bool = False,
                interpret: bool = False):
    """NHWC bilinear resize via the MXU kernel (no skip)."""
    B, H, W, C = x.shape
    xp = x.transpose(0, 3, 1, 2).reshape(B * C, H, W).astype(jnp.float32)
    out = resize_planes(xp, out_hw, align_corners, interpret=interpret)
    return out.reshape(B, C, *out_hw).transpose(0, 2, 3, 1).astype(x.dtype)


def pallas_pyramid(x_c, hx1, hx2, size, align_corners: bool = False):
    """The LED logit pyramid (``decode_head.py:362-379`` semantics) with the
    fused MXU kernels; exact vs the gather path (tested)."""
    q = (-(-size[0] // 4), -(-size[1] // 4))
    h = (-(-size[0] // 2), -(-size[1] // 2))
    r = resize_add_nhwc(x_c, hx2, align_corners) \
        if hx2.shape[1:3] == q else \
        hx2 + resize_nhwc(x_c, q, align_corners)
    r = resize_add_nhwc(r, hx1, align_corners) \
        if hx1.shape[1:3] == h else \
        hx1 + resize_nhwc(r, h, align_corners)
    return resize_nhwc(r, size, align_corners)
