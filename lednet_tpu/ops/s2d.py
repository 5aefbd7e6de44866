"""Space-to-depth reparameterization of strided stem convolutions.

TPU-native rationale: a 3x3/s2 conv on a 3-channel 720p image keeps only
3 of the MXU's 128 contraction lanes busy — the honest device profile
(``tools/speed/profile_forward.py``, docs/latency.md) measured LED-Net's
``stem_conv1`` at 1.39 ms of a 6.8 ms forward, plus ~0.8 ms of layout
copies created by the 3-channel-minor tiling it forces on its neighbours.
Packing r x r input pixels into channels (space-to-depth) turns the same
convolution into a 2x2 kernel over r*r*C_in channels — identical math
(weights rearranged, zero-filled where taps fall outside the window),
but with an MXU-shaped contraction.  Measured standalone: 943 us -> 85 us
for stem_conv1, 283 us -> <50 us for stem_conv2.

This mirrors the classic MLPerf ResNet space-to-depth trick; here it is a
pure *reparameterization* applied at eval time (BN running stats fold into
the conv), so parameters stay in the reference layout
(cf. reference ``mmseg/models/backbones/ddrnet.py`` stem,
``tools/speed/ddrnet_speed.py:40-120`` — the torch stem has no analogue
of this because CUDA cores don't starve on 3-channel convs the way a
128-lane systolic array does).

Contract used throughout: ``space_to_depth`` packs with channel index
``(py*r + px)*C + c``; the weight builders below follow the same order.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


def space_to_depth(x: jnp.ndarray, r: int) -> jnp.ndarray:
    """(B, H, W, C) -> (B, H/r, W/r, r*r*C); H, W must divide by ``r``."""
    B, H, W, C = x.shape
    x = x.reshape(B, H // r, r, W // r, r, C)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(B, H // r, W // r,
                                                 r * r * C)


def depth_to_space(x: jnp.ndarray, r: int) -> jnp.ndarray:
    """Inverse of :func:`space_to_depth`."""
    B, H, W, C = x.shape
    c = C // (r * r)
    x = x.reshape(B, H, W, r, r, c).transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(B, H * r, W * r, c)


@functools.lru_cache(maxsize=None)
def _s2_selector(r_out: int) -> np.ndarray:
    """Constant 0/1 tensor routing 3x3/s2 taps into the packed 2x2 kernel.

    S[ky, kx, cy, cx, py, px, a, b] = 1 iff original tap (ky, kx) of output
    position (a, b) within its r_out x r_out output cell reads input pixel
    (py, px) of the input cell at kernel offset (cy, cx) (0 = previous cell,
    1 = current; SAME pad 1 on the original conv => pad (1, 0) on cells).
    """
    r_in = 2 * r_out
    S = np.zeros((3, 3, 2, 2, r_in, r_in, r_out, r_out), np.float32)
    for a in range(r_out):
        for b in range(r_out):
            for ky in range(3):
                for kx in range(3):
                    oy, ox = 2 * a + ky - 1, 2 * b + kx - 1
                    cy, py = (1, oy) if oy >= 0 else (0, oy + r_in)
                    cx, px = (1, ox) if ox >= 0 else (0, ox + r_in)
                    S[ky, kx, cy, cx, py, px, a, b] = 1.0
    return S


def pack_s2_conv_weights(w: jnp.ndarray, r_out: int) -> jnp.ndarray:
    """Rearrange a (3, 3, Cin, Cout) stride-2 SAME-pad conv kernel into the
    (2, 2, (2*r_out)**2 * Cin, r_out**2 * Cout) kernel that computes the
    identical map over ``space_to_depth(x, 2*r_out)`` input, emitting
    ``r_out``-packed output (``r_out=1`` -> unpacked)."""
    kh, kw, Cin, Cout = w.shape
    assert (kh, kw) == (3, 3), 'stride-2 stem convs are 3x3'
    r_in = 2 * r_out
    S = jnp.asarray(_s2_selector(r_out), w.dtype)
    big = jnp.einsum('xyczpqab,xyio->czpqiabo', S, w)
    # (2,2,r_in,r_in,Cin,r_out,r_out,Cout) -> merge (p,q,i) and (a,b,o)
    return big.reshape(2, 2, r_in * r_in * Cin, r_out * r_out * Cout)


def s2_conv_packed(x_packed: jnp.ndarray, w_big: jnp.ndarray) -> jnp.ndarray:
    """Apply a :func:`pack_s2_conv_weights` kernel: 2x2 conv over cells with
    one-cell pad on top/left (the SAME-pad halo of the original conv)."""
    return jax.lax.conv_general_dilated(
        x_packed, w_big, (1, 1), ((1, 0), (1, 0)),
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'))


def compose_s2_conv_weights(w: jnp.ndarray, r_out: int = 2) -> jnp.ndarray:
    """Compose space-to-depth(2*r_out) with :func:`pack_s2_conv_weights`
    into ONE plain conv on the un-packed input: a (3,3,Cin,Cout)/s2 kernel
    becomes (4*r_out, 4*r_out, Cin, r_out*r_out*Cout) at stride 2*r_out,
    pad (2*r_out, 0).  Same math; XLA's emitter then handles the patch
    extraction internally — measurably cheaper than materializing the
    packed input (the explicit s2d transpose costs ~3x the conv itself
    at 720p, docs/latency.md)."""
    kh, kw, Cin, Cout = w.shape
    r_in = 2 * r_out
    wb = pack_s2_conv_weights(w, r_out)                # (2,2,r_in^2*Cin,·)
    wb = wb.reshape(2, 2, r_in, r_in, Cin, r_out * r_out * Cout)
    big = jnp.zeros((2 * r_in, 2 * r_in, Cin, r_out * r_out * Cout),
                    w.dtype)
    for cy in range(2):
        for cx in range(2):
            big = big.at[cy * r_in:(cy + 1) * r_in,
                         cx * r_in:(cx + 1) * r_in].set(wb[cy, cx])
    return big


def composed_s2_conv(x: jnp.ndarray, w_big: jnp.ndarray,
                     r_out: int = 2) -> jnp.ndarray:
    """Run the composed kernel on the plain (B, H, W, Cin) input; returns
    the r_out x r_out-packed (B, H/(2*r_out), W/(2*r_out), ...) output."""
    r_in = 2 * r_out
    return jax.lax.conv_general_dilated(
        x, w_big, (r_in, r_in), ((r_in, 0), (r_in, 0)),
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'))


@functools.lru_cache(maxsize=None)
def _s1_selector(r: int) -> np.ndarray:
    """Constant router for a stride-1 3x3 conv over width-packed lanes.

    S[ky, kx, cx, px, b] = 1 iff tap (ky, kx) of output position b within
    its r-wide pack reads input position px of the pack at kernel width
    offset cx (0=prev, 1=curr, 2=next)."""
    S = np.zeros((3, 3, 3, r, r), np.float32)
    for b in range(r):
        for ky in range(3):
            for kx in range(3):
                ox = b + kx - 1
                cx, px = (1, ox) if 0 <= ox < r else (
                    (0, ox + r) if ox < 0 else (2, ox - r))
                S[ky, kx, cx, px, b] = 1.0
    return S


def pack_w(x: jnp.ndarray, r: int = 4) -> jnp.ndarray:
    """(B, H, W, C) -> (B, H, W/r, r*C): fold ``r`` consecutive columns into
    lanes (channel index ``p*C + c``)."""
    B, H, W, C = x.shape
    return x.reshape(B, H, W // r, r * C)


def unpack_w(x: jnp.ndarray, r: int = 4) -> jnp.ndarray:
    B, H, W, C = x.shape
    return x.reshape(B, H, W * r, C // r)


def pack_s1_conv_weights(w: jnp.ndarray, r: int) -> jnp.ndarray:
    """(3, 3, Cin, Cout) stride-1 SAME conv -> (3, 3, r*Cin, r*Cout) banded
    kernel over width-packed lanes (pad 1 cell each side).  4x nominal FLOP
    inflation buys a 128-lane contraction — a net win for C_in <= 32."""
    kh, kw, Cin, Cout = w.shape
    assert (kh, kw) == (3, 3)
    S = jnp.asarray(_s1_selector(r), w.dtype)
    big = jnp.einsum('xyzpb,xyio->xzpibo', S, w)
    return big.reshape(3, 3, r * Cin, r * Cout)


def s1_conv_packed(x_packed: jnp.ndarray, w_big: jnp.ndarray,
                   kh_pad: int = 1) -> jnp.ndarray:
    return jax.lax.conv_general_dilated(
        x_packed, w_big, (1, 1), ((kh_pad, kh_pad), (1, 1)),
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'))


class Packed4x4(NamedTuple):
    """A 4x4 space-to-depth packed image (B, H/4, W/4, 16*C) as produced by
    the preprocessor's fused pack path
    (:func:`lednet_tpu.ops.pallas.s2d_input.normalize_s2d`).

    ``bgr``: the packed channels are still in file (BGR) order — the
    consumer folds the flip into its first conv's input-channel axis
    (a pure weight permutation) instead of paying a data-movement flip.
    """
    data: jnp.ndarray
    bgr: bool = False

    def unpack(self) -> jnp.ndarray:
        x = depth_to_space(self.data, 4)
        return x[..., ::-1] if self.bgr else x


class Packed2x2(NamedTuple):
    """A feature map carried in 2x2 space-to-depth form (B, H/2, W/2, 4*C).

    Producers (LEDNet's s2d stem) hand this to consumers that know how to
    compute on the packed layout (LEDHead's packed ``head_x1``); it is a
    pytree, so it flows through jit/sharding unchanged.  ``unpack()``
    recovers the plain (B, H, W, C) map."""
    data: jnp.ndarray

    @property
    def channels(self) -> int:
        return self.data.shape[-1] // 4

    def unpack(self) -> jnp.ndarray:
        return depth_to_space(self.data, 2)


@functools.lru_cache(maxsize=None)
def _s1_selector_2d(r: int) -> np.ndarray:
    """Router for a stride-1 3x3 SAME conv computed on r x r-packed input,
    emitting r x r-packed output.  Kernel becomes 3x3 over cells."""
    S = np.zeros((3, 3, 3, 3, r, r, r, r), np.float32)
    for a in range(r):
        for b in range(r):
            for ky in range(3):
                for kx in range(3):
                    iy, ix = a + ky - 1, b + kx - 1
                    cy, py = 1 + iy // r, iy % r
                    cx, px = 1 + ix // r, ix % r
                    S[ky, kx, cy, cx, py, px, a, b] = 1.0
    return S


def pack_s1_conv2d_weights(w: jnp.ndarray, r: int) -> jnp.ndarray:
    """(3, 3, Cin, Cout) stride-1 SAME conv -> (3, 3, r*r*Cin, r*r*Cout)
    over r x r space-to-depth cells (pad 1 cell each side)."""
    kh, kw, Cin, Cout = w.shape
    assert (kh, kw) == (3, 3)
    S = jnp.asarray(_s1_selector_2d(r), w.dtype)
    big = jnp.einsum('xyczpqab,xyio->czpqiabo', S, w)
    return big.reshape(3, 3, r * r * Cin, r * r * Cout)


def s1_conv2d_packed(x_packed: jnp.ndarray, w_big: jnp.ndarray) -> jnp.ndarray:
    return jax.lax.conv_general_dilated(
        x_packed, w_big, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
