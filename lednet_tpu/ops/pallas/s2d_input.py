"""Pallas kernel: fused normalize + bf16 cast + 4x4 space-to-depth.

The LED-Net eval front end needs the 720p image as a 4x4 space-to-depth
packed (H/4, W/4, 48) bf16 map (``lednet_tpu/ops/s2d.py``).  XLA lowers
the interleave (granularity 3 channels = 6 bytes) as a chain of layout
copies costing ~1.1 ms at 720p — 25% of the whole forward (docs/
latency.md).  A vector-register relayout at that granularity is also the
one thing Mosaic cannot express (sub-128 lane splits are unsupported
shape casts).

The trick here: route the data through the MXU instead of the VPU.

1. ``Y_py = dot(Q_py, X)``: a one-hot (Hc, H) selector contracts the row
   dimension, so ``Y_py`` is the strided row-plane ``X[py::4]`` — and a
   second contraction orientation gives it TRANSPOSED, ``(W*C, Hc)``,
   where the troublesome fine-grained dimension now lies on *sublanes*.
2. The 12-wide regroup becomes a static middle-dim slice assignment of a
   ``(Wc, 48, Hc)`` view — sublane manipulation, fully supported.
3. The result transposes back to ``(Hc, Wc*48)`` in 128-column chunks via
   identity-matrix dots (128-aligned lane writes).

Everything is dots, reshapes on major dims, and static slices; total MXU
work ~8 GFLOP (vs 21+ for a naive one-hot contraction).  One-hot matmuls
move bf16 values exactly (x * 1 sums over a single term).

Measured (chain_slope, v5e): ~1.1 ms XLA chain -> ~0.1 ms kernel at
720p; exactness vs the jnp path is bit-identical after the bf16 cast.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

R = 4            # space-to-depth factor
CHUNK = 128      # lane chunk for the transpose-back


def _kernel(x_ref, m_ref, s_ref, q_ref, o_ref, ot_ref, *, H, W, C,
            normalize):
    # ot_ref: (Wc, 48, Hc) VMEM scratch holding the transposed regrouped map
    f32 = jnp.float32
    bf = jnp.bfloat16
    Hc, Wc = H // R, W // R
    G = R * C                       # 12: regroup granularity
    K = R * R * C                   # 48: packed channels

    x = x_ref[0]                                    # (H, W*C) f32/bf16
    if normalize:
        xn = ((x.astype(f32) - m_ref[:]) / s_ref[:]).astype(bf)
    else:
        xn = x.astype(bf)                           # cast only

    # per row-phase py: Y_py = (X[py::4])^T via one MXU contraction
    for py in range(R):
        q = q_ref[py]                               # (H, Hc) one-hot bf16
        y = jax.lax.dot_general(xn, q, (((0,), (0,)), ((), ())),
                                preferred_element_type=f32
                                ).astype(bf)                 # (W*C, Hc)
        # scatter the 12-wide groups into the (Wc, 48, Hc) view: sublanes
        ot_ref[:, G * py:G * (py + 1), :] = y.reshape(Wc, G, Hc)

    # transpose (Wc*K, Hc) -> (Hc, Wc*K) in 128-column chunks (MXU)
    eye = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, CHUNK), 0) == \
        jax.lax.broadcasted_iota(jnp.int32, (CHUNK, CHUNK), 1)
    eye = eye.astype(bf)
    flat = ot_ref[:].reshape(Wc * K, Hc)
    for c in range((Wc * K) // CHUNK):
        chunk = flat[CHUNK * c:CHUNK * (c + 1), :]          # (128, Hc)
        o_ref[0, :, CHUNK * c:CHUNK * (c + 1)] = jax.lax.dot_general(
            chunk, eye, (((0,), (0,)), ((), ())),
            preferred_element_type=f32).astype(bf)          # (Hc, 128)


@functools.partial(jax.jit, static_argnames=('interpret',))
def normalize_s2d(x: jnp.ndarray, mean=None, std=None, *,
                  interpret: bool = False) -> jnp.ndarray:
    """(B, H, W, C) f32/bf16 -> (B, H/4, W/4, 16*C) bf16:
    optionally ((x - mean)/std), then 4x4 space-to-depth, one kernel.
    ``interpret=True`` runs the Pallas interpreter (CPU CI parity tests)."""
    B, H, W, C = x.shape
    Hc, Wc = H // R, W // R
    normalize = mean is not None
    if normalize:
        mean_t = jnp.tile(mean.astype(jnp.float32), W)[None]
        std_t = jnp.tile(std.astype(jnp.float32), W)[None]
    else:
        mean_t = jnp.zeros((1, W * C), jnp.float32)
        std_t = jnp.ones((1, W * C), jnp.float32)
    q = np.zeros((R, H, Hc), np.float32)
    for py in range(R):
        q[py, py::R, :] = np.eye(Hc)
    q = jnp.asarray(q, jnp.bfloat16)
    kern = functools.partial(_kernel, H=H, W=W, C=C, normalize=normalize)
    out = pl.pallas_call(
        kern,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, H, W * C), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, Hc, Wc * R * R * C),
                               lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, Hc, Wc * R * R * C),
                                       jnp.bfloat16),
        scratch_shapes=[pltpu.VMEM((Wc, R * R * C, Hc), jnp.bfloat16)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=80 * 1024 * 1024),
        interpret=interpret,
    )(x.reshape(B, H, W * C), mean_t, std_t, q)
    return out.reshape(B, Hc, Wc, R * R * C)


def s2d_input_fits(H: int, W: int, C: int = 3, B: int = 1,
                   budget_mb: float = 80.0) -> bool:
    """The kernel needs 4-divisible H/W and a 128-divisible packed width.
    A batch grid > 1 double-buffers the in/out windows (same Mosaic
    behavior as stem_convs_fit; the scratch and the one-hot selectors are
    grid-invariant)."""
    if H % R or W % R or (W // R * R * R * C) % CHUNK:
        return False
    Hc, Wc = H // R, W // R
    buf = 1 if B == 1 else 2
    win = (H * W * C * 4 + Hc * Wc * R * R * C * 2) * buf
    fixed = Wc * R * R * C * Hc * 2 + R * H * Hc * 2
    return win + fixed <= budget_mb * 1024 * 1024