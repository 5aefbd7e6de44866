"""Pallas kernel: the packed LED-Net stem convs (eval mode).

Behavioral spec: ``stem_conv1`` + ``stem_conv2`` of the LED-Net stem
(reference ``tools/speed/ddrnet_speed.py:40-60``), already reparameterized
to their space-to-depth packed forms by
:func:`lednet_tpu.ops.s2d.pack_s2_conv_weights` (BN running stats folded
by the caller):

    h  = relu(conv_2x2(s2d_input, W1) + b1)     # (Hc, Wc, 4c) packed 1/2
    x2 = relu(conv_2x2(h,        W2) + b2)      # (Hc, Wc, c)  @ 1/4

XLA runs the two 2x2 cell convs + bias/ReLU at ~450 us combined at 720p
(docs/latency.md); here both stay in VMEM with the taps as static slices
of a zero-padded scratch and the contractions on the MXU (~60 us).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _conv2x2(scratch, v, w4, H, W):
    """2x2 cell conv with 1-cell zero halo on top/left: 4 MXU dots."""
    f32 = jnp.float32
    scratch[1:H + 1, 1:W + 1] = v
    acc = None
    for cy in range(2):
        for cx in range(2):
            sl = scratch[cy:cy + H, cx:cx + W, :]
            d = jax.lax.dot_general(sl, w4[cy, cx],
                                    (((2,), (0,)), ((), ())),
                                    preferred_element_type=f32)
            acc = d if acc is None else acc + d
    return acc


def _kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, h_ref, x2_ref,
            s1, s2, *, H, W):
    f32 = jnp.float32
    ct = x_ref.dtype
    # halo zeroing (interiors rewritten by _conv2x2)
    for s_, C in ((s1, x_ref.shape[-1]), (s2, h_ref.shape[-1])):
        s_[0:1] = jnp.zeros((1, W + 1, C), ct)
        s_[1:H + 1, 0:1] = jnp.zeros((H, 1, C), ct)
    h = jnp.maximum(_conv2x2(s1, x_ref[0], w1_ref[:], H, W)
                    + b1_ref[0].astype(f32), 0.0).astype(ct)
    h_ref[0] = h
    x2_ref[0] = jnp.maximum(_conv2x2(s2, h, w2_ref[:], H, W)
                            + b2_ref[0].astype(f32), 0.0).astype(ct)


@functools.partial(jax.jit, static_argnames=('interpret',))
def stem_convs_packed(xp: jnp.ndarray, w1, b1, w2, b2, *,
                      interpret: bool = False):
    """xp: (B, Hc, Wc, K1) packed input; w1: (2, 2, K1, C1); w2:
    (2, 2, C1, C2); biases (1, C1)/(1, C2) f32.  Returns (h, x2).
    ``interpret=True`` runs the Pallas interpreter (CPU CI parity tests)."""
    B, H, W, K1 = xp.shape
    C1, C2 = w1.shape[-1], w2.shape[-1]
    kern = functools.partial(_kernel, H=H, W=W)
    return pl.pallas_call(
        kern,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, H, W, K1), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=[pl.BlockSpec((1, H, W, C1), lambda b: (b, 0, 0, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((1, H, W, C2), lambda b: (b, 0, 0, 0),
                                memory_space=pltpu.VMEM)],
        out_shape=[jax.ShapeDtypeStruct((B, H, W, C1), xp.dtype),
                   jax.ShapeDtypeStruct((B, H, W, C2), xp.dtype)],
        scratch_shapes=[pltpu.VMEM((H + 1, W + 1, K1), xp.dtype),
                        pltpu.VMEM((H + 1, W + 1, C1), xp.dtype)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=80 * 1024 * 1024),
        interpret=interpret,
    )(xp, w1, b1, w2, b2)


def stem_convs_fit(H: int, W: int, K1: int = 48, C1: int = 128,
                   C2: int = 32, B: int = 1,
                   budget_mb: float = 80.0) -> bool:
    """Model what Mosaic ACTUALLY allocates, not the logical sizes
    (measured from the 1024^2 bs=8 VMEM OOM, 2026-08-22): every window's
    channel dim pads to the 128-lane tile (the (.,.,.,32) x2 window
    allocates at 128 lanes), scratch second-minor pads to the 8-sublane
    tile, and a batch grid > 1 double-buffers every in/out window.  At
    720p bs=1 this model gives ~74.6 MB — just under the 80 MB limit the
    kernel empirically runs at; at 1024^2 bs=8 it gives ~135 MB, which is
    the observed OOM."""
    lane = lambda c: -(-c // 128) * 128
    sub = lambda w: -(-w // 8) * 8
    buf = 1 if B == 1 else 2
    win = H * W * (lane(K1) + lane(C1) + lane(C2)) * 2 * buf
    scr = (H + 1) * sub(W + 1) * (lane(K1) + lane(C1)) * 2
    return win + scr <= budget_mb * 1024 * 1024