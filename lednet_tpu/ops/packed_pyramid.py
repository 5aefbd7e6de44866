"""Logit-pyramid resizes computed in space-to-depth packed form.

The LED predict pyramid (reference ``mmseg/models/decode_heads/
decode_head.py:362-379``) chains three half-pixel 2x bilinear upsamples
over ``num_classes``-channel maps (C=2 for the branch configs, 19 for
cityscapes).  On TPU, NHWC tensors with C<<128 starve the 128-wide lane
dimension, and every gather/interleave on them moves pathological
2-element chunks — the honest per-op profile put the whole tail at
~670 us of the 3.2 ms 720p forward (docs/latency.md).

This module keeps every pyramid level PACKED on the coarsest (H/8, W/8)
cell grid: a level-``l`` map lives as ``(B, h, w, r, r, C)`` with
``r = 2^l`` sub-positions per cell, so the full-resolution logits occupy
``r*r*C`` lanes (128 for r=8, C=2) and the 2x upsample becomes
cell-shifts + channel-group selects + elementwise lerps — no
narrow-chunk data movement until one final ``depth_to_space`` (which
moves (r, C) = 16-lane chunks instead of C=2).

The math is bit-identical to :func:`lednet_tpu.ops.resize.resize_bilinear`
(align_corners=False, exact 2x): even outputs blend (src[i-1], src[i]) at
weight 0.75, odd outputs blend (src[i], src[i+1]) at 0.25, with the
first/last rows clamped to the border sample (``tests/test_packed_pyramid.py``).
"""
from __future__ import annotations

import jax.numpy as jnp


def to_packed(x: jnp.ndarray, r: int) -> jnp.ndarray:
    """(B, H, W, C) -> (B, H/r, W/r, r, r, C) cell-grid form."""
    B, H, W, C = x.shape
    x = x.reshape(B, H // r, r, W // r, r, C)
    return x.transpose(0, 1, 3, 2, 4, 5)


def from_packed(p: jnp.ndarray) -> jnp.ndarray:
    """(B, h, w, r, r, C) -> (B, h*r, w*r, C)."""
    B, h, w, r, _, C = p.shape
    return p.transpose(0, 1, 3, 2, 4, 5).reshape(B, h * r, w * r, C)


def repack(p: jnp.ndarray, r_new: int) -> jnp.ndarray:
    """Re-express a packed map on a coarser cell grid: (B, h, w, r, r, C)
    -> (B, h/f, w/f, r_new, r_new, C) with ``f = r_new // r`` (the cell
    grids nest, so this is a pure reshape/transpose of (r, C) chunks)."""
    B, h, w, r, _, C = p.shape
    f = r_new // r
    assert f * r == r_new and h % f == 0 and w % f == 0
    p = p.reshape(B, h // f, f, w // f, f, r, r, C)
    p = p.transpose(0, 1, 3, 2, 5, 4, 6, 7)
    return p.reshape(B, h // f, w // f, r_new, r_new, C)


def _up2_sub(p: jnp.ndarray, cell_axis: int, sub_axis: int) -> jnp.ndarray:
    """Half-pixel 2x upsample along one spatial direction of a packed map:
    doubles the ``sub_axis`` extent using neighbour taps that cross cell
    boundaries via edge-clamped shifts of ``cell_axis``."""
    r = p.shape[sub_axis]
    ndim = p.ndim

    def sl(axis, s):
        return tuple(s if d == axis else slice(None) for d in range(ndim))

    # cell neighbours (edge-clamped)
    down = jnp.concatenate([p[sl(cell_axis, slice(0, 1))],
                            p[sl(cell_axis, slice(0, -1))]], axis=cell_axis)
    up = jnp.concatenate([p[sl(cell_axis, slice(1, None))],
                          p[sl(cell_axis, slice(-1, None))]], axis=cell_axis)
    # sub-position i-1 / i+1 across the whole map
    prev = jnp.concatenate([down[sl(sub_axis, slice(r - 1, r))],
                            p[sl(sub_axis, slice(0, r - 1))]], axis=sub_axis)
    nxt = jnp.concatenate([p[sl(sub_axis, slice(1, None))],
                           up[sl(sub_axis, slice(0, 1))]], axis=sub_axis)
    even = prev + (p - prev) * 0.75
    odd = p + (nxt - p) * 0.25
    # global border rows: even[0] must be exactly src[0] (half-pixel clamp)
    # and odd[-1] exactly src[-1]; the cell clamp above lands on the wrong
    # sub-row there, so overwrite the two border slices.
    first = sl(cell_axis, slice(0, 1))
    even = even.at[tuple(slice(0, 1) if d in (cell_axis, sub_axis)
                         else slice(None) for d in range(ndim))].set(
        p[tuple(slice(0, 1) if d in (cell_axis, sub_axis) else slice(None)
                for d in range(ndim))])
    odd = odd.at[tuple(slice(-1, None) if d in (cell_axis, sub_axis)
                       else slice(None) for d in range(ndim))].set(
        p[tuple(slice(-1, None) if d in (cell_axis, sub_axis)
                else slice(None) for d in range(ndim))])
    del first
    stacked = jnp.stack([even, odd], axis=sub_axis + 1)
    shape = list(p.shape)
    shape[sub_axis] = 2 * r
    return stacked.reshape(shape)


def up2_packed(p: jnp.ndarray) -> jnp.ndarray:
    """Exact half-pixel 2x bilinear upsample of a packed map:
    (B, h, w, r, r, C) -> (B, h, w, 2r, 2r, C); equals
    ``to_packed(resize_bilinear(from_packed(p), 2x), 2r)``."""
    p = _up2_sub(p, cell_axis=1, sub_axis=3)   # H direction
    return _up2_sub(p, cell_axis=2, sub_axis=4)  # W direction
