"""Fused Pallas kernel for LED-Net's stem BasicBlock pair (eval mode).

Behavioral spec: two ResNet BasicBlocks at 32 channels on the 1/4-scale map
(reference ``mmseg/models/utils/basic_block.py:13-75``; LEDNet stem per
``tools/speed/ddrnet_speed.py:40-120``) followed by the stem's trailing
ReLU:

    b1 = relu(bn(conv(relu(bn(conv(x)))))) + x)        # act_out=True
    b2 =      bn(conv(relu(bn(conv(b1))))) + b1        # act_out=False
    out = relu(b2)

Why a kernel: XLA lowers each 32-channel 3x3 conv at (180, 320) to a
~200 us program (the honest profile, docs/latency.md) — a 25%-lane
contraction plus layout copies.  Here every conv runs on a width-packed
view (H, W/4, 4*32=128) whose banded kernels
(:func:`lednet_tpu.ops.s2d.pack_s1_conv_weights`) give a full 128x128 MXU
contraction (4x nominal FLOP inflation, >10x faster in practice), and the
whole 4-conv chain stays in VMEM: one custom call instead of ~10 HBM
round trips.  BN running stats are folded into the conv weights by the
caller; everything accumulates in f32.

Forward/eval only — training keeps the unfused module path.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _conv3_banded(scratch, w9, H, Wp, C):
    """3x3 banded conv over the packed (H, Wp, C) interior of ``scratch``
    (1-cell zero halo): 9 full-lane MXU contractions."""
    acc = None
    for ky in range(3):
        for kx in range(3):
            sl = scratch[ky:ky + H, kx:kx + Wp, :]
            d = jax.lax.dot_general(sl, w9[ky, kx],
                                    (((2,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            acc = d if acc is None else acc + d
    return acc


def _pair_kernel(x_ref, w_ref, b_ref, o_ref, scratch, *, H, Wp, C):
    # Compute dtype = I/O dtype (bf16 on the inference path: native MXU
    # passes, f32 accumulation via preferred_element_type — the same
    # numerics XLA's bf16 convs use); f32 I/O runs f32 throughout.
    f32 = jnp.float32
    ct = x_ref.dtype
    x = x_ref[0]                                            # (H, Wp, C)
    # zero the halo once; every conv rewrites only the interior
    scratch[0:1] = jnp.zeros((1, Wp + 2, C), ct)
    scratch[H + 1:] = jnp.zeros((1, Wp + 2, C), ct)
    scratch[1:H + 1, 0:1] = jnp.zeros((H, 1, C), ct)
    scratch[1:H + 1, Wp + 1:] = jnp.zeros((H, 1, C), ct)

    def conv(v, i):
        scratch[1:H + 1, 1:Wp + 1] = v.astype(ct)
        return _conv3_banded(scratch, w_ref[i], H, Wp, C) \
            + b_ref[i, 0].astype(f32)

    h = jnp.maximum(conv(x, 0), 0.0)
    b1 = jnp.maximum(conv(h, 1) + x.astype(f32), 0.0)       # act_out=True
    h = jnp.maximum(conv(b1, 2), 0.0)
    o_ref[0] = jnp.maximum(conv(h, 3) + b1, 0.0).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=('interpret',))
def basic_pair_packed(x_packed: jnp.ndarray, w_banded: jnp.ndarray,
                      biases: jnp.ndarray, *,
                      interpret: bool = False) -> jnp.ndarray:
    """Run the fused BasicBlock pair on a width-packed map.

    x_packed: (B, H, Wp, 128) — ``x.reshape(B, H, W//4, 4*C)`` of the
        (B, H, W, 32) stem map (a flat-order-preserving view).
    w_banded: (4, 3, 3, 128, 128) — the four conv kernels, BN-folded and
        passed through ``pack_s1_conv_weights(w, 4)``.
    biases: (4, 1, 128) — folded BN biases, tiled over the 4 packed
        positions.
    Returns the packed (B, H, Wp, 128) result of the pair + trailing ReLU.
    """
    B, H, Wp, C = x_packed.shape
    kern = functools.partial(_pair_kernel, H=H, Wp=Wp, C=C)
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((B, H, Wp, C), x_packed.dtype),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, H, Wp, C), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, H, Wp, C), lambda b: (b, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((H + 2, Wp + 2, C), x_packed.dtype)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=80 * 1024 * 1024),
        interpret=interpret,
    )(x_packed, w_banded, biases)


def pair_fits(H: int, W: int, C: int = 32, budget_mb: float = 80.0,
              itemsize: int = 2, B: int = 1) -> bool:
    """VMEM gate modeling what the kernel actually allocates (ADVICE r4):
    scratch/in/out blocks and the banded weights in the I/O dtype
    (``itemsize`` — 2 for the bf16 inference path), plus the live f32
    values (``h``, ``b1`` and the conv accumulator).  A batch grid > 1
    double-buffers the in/out grid blocks (same Mosaic behavior measured
    for stem_convs_packed, 2026-08-22)."""
    if W % 4 or (W // 4) % 2 or C != 32:
        return False
    Wp, L = W // 4, 4 * C
    buf = 1 if B == 1 else 2
    io_bytes = ((H + 2) * (Wp + 2) * L          # halo scratch
                + buf * 2 * H * Wp * L          # in + out grid blocks
                + 4 * 9 * L * L) * itemsize     # four banded kernels
    f32_bytes = (3 * H * Wp * L + 4 * L) * 4    # h, b1, acc + biases
    return io_bytes + f32_bytes <= budget_mb * 1024 * 1024


def basic_pair(x: jnp.ndarray, w_folded, biases) -> jnp.ndarray:
    """Convenience wrapper: (B, H, W, 32) in, packed kernel inside.

    w_folded: list of four (3, 3, 32, 32) BN-folded kernels.
    biases: list of four (32,) folded biases.
    """
    from lednet_tpu.ops.s2d import pack_s1_conv_weights
    B, H, W, C = x.shape
    wb = jnp.stack([pack_s1_conv_weights(w, 4) for w in w_folded]) \
        .astype(x.dtype)
    bb = jnp.stack([jnp.tile(b, 4)[None].astype(jnp.float32)
                    for b in biases])
    xp = x.reshape(B, H, W // 4, 4 * C)
    out = basic_pair_packed(xp, wb, bb)
    return out.reshape(B, H, W, C)
