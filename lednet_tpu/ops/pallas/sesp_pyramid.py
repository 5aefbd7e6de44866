"""Fused Pallas kernel for the SESP dilated-depthwise pyramid.

Behavioral spec: the k-branch TRANSFORM stage of the reference SESP block
(``mmseg/models/nn_layers/eesp.py:15-118`` — k depthwise 3x3 dilated convs
over a shared reduced input, hierarchical feature fusion ``b_i += b_{i-1}``,
then a second depthwise dilated stage at dilation d+1 per branch), i.e.
exactly the ``branches`` computation in
:class:`lednet_tpu.models.espnet.SESP`, returning their channel concat.

Why a kernel: the honest on-chip profile (docs/latency.md) shows XLA runs
this pyramid as ~100 tiny HBM-round-tripping ops per SESP block (shifted
multiply-adds + layout copies), ~55% of whole-forward time at 720p. Here
the whole pyramid is one VPU program over a zero-padded VMEM scratch:

- every depthwise tap is a *static slice* of the padded scratch times a
  per-lane weight row (branch selection is folded into zeros in the row,
  so taps sharing a spatial offset collapse into one fused multiply-add);
- the k branches live side by side in the lane dimension (``k*n``
  channels), so the HFF cumulative sum is two log-step lane rolls and the
  branch concat is free;
- stride-2 variants subsample with strided slices of the same scratch.

The kernel is inference/forward-only (no custom VJP yet) — the module
falls back to the shift formulation under autodiff.
"""
from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _merge_taps(rates: Sequence[int], kernels: jnp.ndarray, n: int):
    """Merge per-branch 3x3 taps that share a spatial offset.

    ``kernels``: (k, 3, 3, n). Returns (offsets, rows) where ``offsets`` is
    a static python list of (dy, dx) and ``rows`` a (T, k*n) array whose
    row t holds each branch's tap weight in its own lane block (zeros for
    branches that have no tap at that offset).
    """
    k = len(rates)
    slots = {}
    for g, d in enumerate(rates):
        for ky in range(3):
            for kx in range(3):
                off = ((ky - 1) * d, (kx - 1) * d)
                slots.setdefault(off, []).append((g, ky, kx))
    offsets = sorted(slots)
    rows = []
    for off in offsets:
        row = [jnp.zeros((n,), kernels.dtype) for _ in range(k)]
        for g, ky, kx in slots[off]:
            row[g] = kernels[g, ky, kx]
        rows.append(jnp.concatenate(row))
    return offsets, jnp.stack(rows)


def _pyramid_kernel(r_ref, w1_ref, w2_ref, o_ref, scratch,
                    *, H, W, n, k, M, offs1, offs2, stride, acc_f32):
    # NOTE: the kernel computes in f32 throughout — Mosaic (2026-08 libtpu)
    # fails to compile the offset sublane slices of a (16,128)-tiled bf16
    # scratch, and f32 also sidesteps bf16 accumulation-order drift. I/O may
    # still be bf16; casts happen at the boundary.  ``acc_f32`` is kept for
    # API stability (both settings now accumulate in f32).
    del acc_f32
    out = _pyramid_body(r_ref[0].astype(jnp.float32), w1_ref, w2_ref,
                        scratch, H=H, W=W, n=n, k=k, M=M,
                        offs1=offs1, offs2=offs2, stride=stride)
    o_ref[0] = out.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=('rates', 'stride', 'acc_f32',
                                             'interpret'))
def sesp_pyramid(reduced: jnp.ndarray, dw1: jnp.ndarray, dw2, *,
                 rates: Tuple[int, ...], stride: int = 1,
                 acc_f32: bool = True,
                 interpret: bool = False) -> jnp.ndarray:
    """Fused SESP branch pyramid.

    reduced: (B, H, W, n) shared reduced input.
    dw1: (k, 3, 3, n) per-branch depthwise kernels (dilation ``rates[g]``).
    dw2: (k, 3, 3, n) second-stage kernels (dilation ``rates[g]+1``), or
        None to skip the SESPV2 stage.
    Returns (B, H2, W2, k*n) — ``concat(branches, -1)`` after HFF (+v2),
    numerically the map of the unfused path with f32 tap accumulation.
    """
    B, H, W, n = reduced.shape
    k = len(rates)
    C = k * n
    offs1, rows1 = _merge_taps(rates, dw1.astype(reduced.dtype), n)
    if dw2 is not None:
        offs2, rows2 = _merge_taps(tuple(d + 1 for d in rates),
                                   dw2.astype(reduced.dtype), n)
        M = max(d + 1 for d in rates)
    else:
        offs2, rows2 = None, jnp.zeros((1, C), reduced.dtype)
        M = max(rates)
    H2 = -(-H // stride)
    W2 = -(-W // stride)

    kern = functools.partial(
        _pyramid_kernel, H=H, W=W, n=n, k=k, M=M,
        offs1=offs1, offs2=offs2, stride=stride, acc_f32=acc_f32)
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((B, H2, W2, C), reduced.dtype),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, H, W, n), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, H2, W2, C), lambda b: (b, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((H + 2 * M, W + 2 * M, C), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            # v5e has 128 MB VMEM; the default 16 MB scoped limit is too
            # small for the f32 whole-plane working set at 1/8-scale maps
            vmem_limit_bytes=80 * 1024 * 1024),
        interpret=interpret,
    )(reduced, rows1, rows2)


def _prelu(x, alpha):
    return jnp.where(x >= 0, x, alpha * x)


def _pyramid_body(red, w1_ref, w2_ref, scratch,
                  *, H, W, n, k, M, offs1, offs2, stride):
    """Shared pyramid computation on an f32 (H, W, n) value ``red``."""
    C = k * n
    H2 = -(-H // stride)
    W2 = -(-W // stride)
    facc = jnp.float32

    scratch[:M] = jnp.zeros((M, W + 2 * M, C), scratch.dtype)
    scratch[M + H:] = jnp.zeros((M, W + 2 * M, C), scratch.dtype)
    scratch[M:M + H, :M] = jnp.zeros((H, M, C), scratch.dtype)
    scratch[M:M + H, M + W:] = jnp.zeros((H, M, C), scratch.dtype)
    scratch[M:M + H, M:M + W] = pltpu.repeat(red, k, axis=2)

    acc = jnp.zeros((H2, W2, C), facc)
    for t, (dy, dx) in enumerate(offs1):
        sl = scratch[M + dy:M + dy + (H2 - 1) * stride + 1:stride,
                     M + dx:M + dx + (W2 - 1) * stride + 1:stride, :]
        acc = acc + sl * w1_ref[t].astype(facc)

    lane = jax.lax.broadcasted_iota(jnp.int32, (H2, W2, C), 2)
    step = n
    while step < C:
        shifted = pltpu.roll(acc, step, axis=2)
        acc = acc + jnp.where(lane >= step, shifted, 0)
        step *= 2

    if offs2 is None:
        return acc
    scratch[M:M + H2, M:M + W2] = acc.astype(scratch.dtype)
    if stride != 1:
        scratch[M + H2:M + H] = jnp.zeros((H - H2, W + 2 * M, C),
                                          scratch.dtype)
        scratch[M:M + H2, M + W2:M + W] = jnp.zeros((H2, W - W2, C),
                                                    scratch.dtype)
    out = jnp.zeros((H2, W2, C), facc)
    for t, (dy, dx) in enumerate(offs2):
        sl = scratch[M + dy:M + dy + H2, M + dx:M + dx + W2, :]
        out = out + sl * w2_ref[t].astype(facc)
    return out


def _block_kernel(x_ref, wred_ref, bred_ref, a1_ref, w1_ref, w2_ref,
                  s2_ref, b2_ref, a2_ref, wexp_ref, bexp_ref, a3_ref,
                  o_ref, scratch,
                  *, H, W, n, k, M, offs1, offs2, stride, tail, prec):
    f32 = jnp.float32
    xv = x_ref[0].astype(f32)                              # (H, W, Cin)
    red = jax.lax.dot_general(xv, wred_ref[:].astype(f32),
                              (((2,), (0,)), ((), ())),
                              preferred_element_type=f32, precision=prec)
    red = _prelu(red + bred_ref[0].astype(f32), a1_ref[0].astype(f32))

    pyr = _pyramid_body(red, w1_ref, w2_ref, scratch, H=H, W=W, n=n, k=k,
                        M=M, offs1=offs1, offs2=offs2, stride=stride)

    y = _prelu(pyr * s2_ref[0].astype(f32) + b2_ref[0].astype(f32),
               a2_ref[0].astype(f32))
    z = jax.lax.dot_general(y, wexp_ref[:].astype(f32),
                            (((2,), (0,)), ((), ())),
                            preferred_element_type=f32, precision=prec)
    z = z + bexp_ref[0].astype(f32)
    if tail == 'residual':
        z = _prelu(z + xv, a3_ref[0].astype(f32))
    elif tail == 'act':
        z = _prelu(z, a3_ref[0].astype(f32))
    o_ref[0] = z.astype(o_ref.dtype)


@functools.partial(jax.jit,
                   static_argnames=('rates', 'stride', 'tail', 'exact',
                                    'interpret'))
def sesp_block(x: jnp.ndarray, wred, bred, a1, dw1, dw2, s2, b2, a2,
               wexp, bexp, a3, *, rates: Tuple[int, ...], stride: int = 1,
               tail: str = 'residual', exact: bool = False,
               interpret: bool = False) -> jnp.ndarray:
    """One fused kernel for a whole eval-mode SESP block.

    Covers: REDUCE (dense-expanded grouped 1x1, BN folded, PReLU) ->
    dilated pyramid + HFF (+v2) -> BN+PReLU on the concat -> MERGE
    (dense-expanded grouped 1x1, BN folded) -> residual / activation tail.
    Matmuls run on the MXU in-kernel; everything else is VPU work on VMEM —
    one custom call instead of ~10 XLA ops + boundary layout copies.

    wred: (Cin, n) dense reduce weight (BN1-folded); bred/a1: (1, n).
    dw1/dw2: (k, 3, 3, n) depthwise stacks (dw2 may be None).
    s2/b2/a2: (1, k*n) BN2 scale/bias + PReLU2 alpha.
    wexp: (k*n, k*n) dense expand weight (BN3-folded); bexp: (1, k*n).
    a3: (1, k*n) tail PReLU alpha (pass zeros when ``tail='plain'``).
    ``exact=True`` forces f32-exact MXU passes (parity paths); default lets
    the MXU run its native bf16 passes like the surrounding XLA convs.
    """
    B, H, W, Cin = x.shape
    k = len(rates)
    n = dw1.shape[-1]
    C = k * n
    offs1, rows1 = _merge_taps(rates, dw1.astype(x.dtype), n)
    if dw2 is not None:
        offs2, rows2 = _merge_taps(tuple(d + 1 for d in rates),
                                   dw2.astype(x.dtype), n)
        M = max(d + 1 for d in rates)
    else:
        offs2, rows2 = None, jnp.zeros((1, C), x.dtype)
        M = max(rates)
    H2 = -(-H // stride)
    W2 = -(-W // stride)
    prec = jax.lax.Precision.HIGHEST if exact else None

    kern = functools.partial(
        _block_kernel, H=H, W=W, n=n, k=k, M=M,
        offs1=offs1, offs2=offs2, stride=stride, tail=tail, prec=prec)
    vec = lambda v: v.reshape(1, -1)
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((B, H2, W2, C), x.dtype),
        grid=(B,),
        in_specs=[pl.BlockSpec((1, H, W, Cin), lambda b: (b, 0, 0, 0),
                               memory_space=pltpu.VMEM)] +
                 [pl.BlockSpec(memory_space=pltpu.VMEM)] * 11,
        out_specs=pl.BlockSpec((1, H2, W2, C), lambda b: (b, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((H + 2 * M, W + 2 * M, C), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=80 * 1024 * 1024),
        interpret=interpret,
    )(x, wred, vec(bred), vec(a1), rows1, rows2, vec(s2), vec(b2), vec(a2),
      wexp, vec(bexp), vec(a3))


def dense_grouped(kernel: jnp.ndarray, groups: int) -> jnp.ndarray:
    """Expand a flax grouped 1x1 conv kernel (1,1,Ci/g,Co) to a dense
    block-diagonal (Ci, Co) matrix (zeros off the group blocks)."""
    k2 = kernel[0, 0]
    ci_g, co = k2.shape
    ci = ci_g * groups
    co_g = co // groups
    w = jnp.zeros((ci, co), k2.dtype)
    for g in range(groups):
        w = w.at[g * ci_g:(g + 1) * ci_g,
                 g * co_g:(g + 1) * co_g].set(k2[:, g * co_g:(g + 1) * co_g])
    return w


def bn_fold(scale, bias, mean, var, eps: float = 1e-5):
    """Eval-mode BatchNorm as per-channel (scale, bias)."""
    s = scale * jax.lax.rsqrt(var + eps)
    return s, bias - mean * s


def pyramid_fits(H: int, W: int, n: int, k: int, dtype_bytes: int = 2,
                 budget_mb: float = 40.0, stride: int = 1,
                 B: int = 1) -> bool:
    """Whether the single-block kernel handles this instantiation.

    Two gates: (a) the whole-plane f32 working set (scratch + accumulator +
    output, with the in/out grid windows double-buffered when the batch
    grid > 1 — measured Mosaic behavior, 2026-08-22) must fit comfortably
    in VMEM with headroom for Mosaic temps;
    (b) Mosaic (2026-08 libtpu) crashes on stride-2 strided scratch reads
    when k*n exceeds one 128-lane tile, so those fall back to the shift
    form (they are deep, tiny-map blocks — not hot).
    """
    C = k * n
    if stride != 1 and C > 128:
        return False
    buf = 1 if B == 1 else 2
    bytes_ = ((H + 10) * (W + 10) * C * 4 * 2
              + buf * (H * W * n * dtype_bytes + H * W * C * dtype_bytes)
              + H * W * C * 4)
    return bytes_ <= budget_mb * 1024 * 1024
