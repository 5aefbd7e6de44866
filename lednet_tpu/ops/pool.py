"""Pooling primitives with torch semantics, NHWC layout.

Parity targets: ``nn.AvgPool2d`` with ``count_include_pad=True`` (the torch
default, used by DAPPM's multi-scale branches — reference
``mmseg/models/utils/ppm.py:66-79`` — and the ESP down-samplers), and
``nn.AdaptiveAvgPool2d`` with torch's floor/ceil bin edges (used by
DAPPM's global branch and Muti_AFF's 4/8/16 context paths, reference
``tools/speed/model_utils_speed.py:330-360``).
"""
from __future__ import annotations

from typing import Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

_Size = Union[int, Tuple[int, int]]


def _pair(v: _Size) -> Tuple[int, int]:
    return (v, v) if isinstance(v, int) else (int(v[0]), int(v[1]))


def avg_pool2d(x: jnp.ndarray, kernel_size: _Size, stride: _Size = None,
               padding: _Size = 0, count_include_pad: bool = True,
               ceil_mode: bool = False) -> jnp.ndarray:
    """torch-style average pooling over NHWC. Zero-padded; window size divisor
    includes padded cells when ``count_include_pad`` (the torch default).
    ``ceil_mode`` keeps windows whose start is in-bounds (extra bottom/right
    coverage); cells past the input never count toward the divisor, matching
    torch."""
    kh, kw = _pair(kernel_size)
    sh, sw = _pair(stride if stride is not None else kernel_size)
    ph, pw = _pair(padding)
    eh = ew = 0
    if ceil_mode:
        in_h, in_w = x.shape[1], x.shape[2]
        eh = (-(in_h + 2 * ph - kh)) % sh
        ew = (-(in_w + 2 * pw - kw)) % sw
    dims = (1, kh, kw, 1)
    strides = (1, sh, sw, 1)
    pads = ((0, 0), (ph, ph + eh), (pw, pw + ew), (0, 0))
    summed = jax.lax.reduce_window(x.astype(jnp.float32), 0.0, jax.lax.add,
                                   dims, strides, pads)
    if count_include_pad and not (eh or ew):
        out = summed / float(kh * kw)
    else:
        if count_include_pad:
            # explicit padding counts, the ceil-overhang does not
            ones = jnp.ones((1, x.shape[1] + 2 * ph, x.shape[2] + 2 * pw, 1),
                            jnp.float32)
            cpads = ((0, 0), (0, eh), (0, ew), (0, 0))
        else:
            ones = jnp.ones((1,) + x.shape[1:3] + (1,), jnp.float32)
            cpads = pads
        counts = jax.lax.reduce_window(ones, 0.0, jax.lax.add, dims, strides,
                                       cpads)
        out = summed / counts
    return out.astype(x.dtype)


def max_pool2d(x: jnp.ndarray, kernel_size: _Size, stride: _Size = None,
               padding: _Size = 0) -> jnp.ndarray:
    kh, kw = _pair(kernel_size)
    sh, sw = _pair(stride if stride is not None else kernel_size)
    ph, pw = _pair(padding)
    if jnp.issubdtype(x.dtype, jnp.floating):
        neg_inf = -jnp.inf
    else:
        # keep the init value in the operand dtype (a bare Python int is
        # weakly typed int32 and reduce_window rejects e.g. uint8 operands)
        neg_inf = jnp.dtype(x.dtype).type(jnp.iinfo(x.dtype).min)
    return jax.lax.reduce_window(x, neg_inf, jax.lax.max,
                                 (1, kh, kw, 1), (1, sh, sw, 1),
                                 ((0, 0), (ph, ph), (pw, pw), (0, 0)))


def global_avg_pool(x: jnp.ndarray, keepdims: bool = True) -> jnp.ndarray:
    """AdaptiveAvgPool2d((1, 1)) over NHWC."""
    return jnp.mean(x.astype(jnp.float32), axis=(-3, -2),
                    keepdims=keepdims).astype(x.dtype)


def adaptive_avg_pool2d(x: jnp.ndarray, output_size: _Size) -> jnp.ndarray:
    """torch AdaptiveAvgPool2d: bin i spans [floor(i*N/out), ceil((i+1)*N/out)).

    Implemented as two small dense matmuls with averaging matrices built at
    trace time (static shapes), which maps onto the MXU instead of a scalar
    binning loop.
    """
    oh, ow = _pair(output_size)
    in_h, in_w = x.shape[-3], x.shape[-2]
    if (oh, ow) == (1, 1):
        return global_avg_pool(x)
    if (oh, ow) == (in_h, in_w):
        return x

    def pool_matrix(out_size: int, in_size: int) -> np.ndarray:
        m = np.zeros((out_size, in_size), np.float32)
        for i in range(out_size):
            lo = (i * in_size) // out_size
            hi = -(-((i + 1) * in_size) // out_size)  # ceil
            m[i, lo:hi] = 1.0 / (hi - lo)
        return m

    mh = jnp.asarray(pool_matrix(oh, in_h))
    mw = jnp.asarray(pool_matrix(ow, in_w))
    xf = x.astype(jnp.float32)
    # precision='highest' keeps the averaging exact on the MXU (default f32
    # matmul precision on TPU is bf16 passes, which breaks torch parity).
    out = jnp.einsum('oh,...hwc->...owc', mh, xf, precision='highest')
    out = jnp.einsum('pw,...owc->...opc', mw, out, precision='highest')
    return out.astype(x.dtype)
