"""Packed-space pyramid upsample == the gather resize, bit-for-bit.

The packed form (lednet_tpu/ops/packed_pyramid.py) must reproduce
``resize_bilinear(align_corners=False)`` exactly at every 2x level —
it replaces the narrow-channel NHWC tail of the LED predict pyramid
(reference ``mmseg/models/decode_heads/decode_head.py:362-379``)."""
import jax.numpy as jnp
import numpy as np
import pytest

from lednet_tpu.ops.packed_pyramid import (from_packed, repack, to_packed,
                                           up2_packed)
from lednet_tpu.ops.resize import resize_bilinear


@pytest.mark.parametrize('shape', [(1, 6, 10, 2), (2, 8, 8, 3),
                                   (1, 90, 160, 2)])
def test_pack_roundtrip(shape):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    p = to_packed(from_packed(to_packed(x, 1)), 1)
    np.testing.assert_array_equal(np.asarray(from_packed(p)), np.asarray(x))


@pytest.mark.parametrize('r', [1, 2, 4])
@pytest.mark.parametrize('hw', [(6, 10), (90, 160), (5, 7)])
def test_up2_matches_resize(r, hw):
    h, w = hw
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((1, h * r, w * r, 2)), jnp.float32)
    ref = resize_bilinear(x, (2 * h * r, 2 * w * r), align_corners=False)
    got = from_packed(up2_packed(to_packed(x, r)))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=0, atol=1e-6)


def test_three_level_chain():
    """xc@(h,w) -> +hx2@2x -> +hx1@4x -> 8x output, both formulations."""
    rng = np.random.default_rng(2)
    h, w, C = 12, 20, 2
    xc = jnp.asarray(rng.standard_normal((1, h, w, C)), jnp.float32)
    hx2 = jnp.asarray(rng.standard_normal((1, 2 * h, 2 * w, C)), jnp.float32)
    hx1 = jnp.asarray(rng.standard_normal((1, 4 * h, 4 * w, C)), jnp.float32)

    ref = hx2 + resize_bilinear(xc, (2 * h, 2 * w))
    ref = hx1 + resize_bilinear(ref, (4 * h, 4 * w))
    ref = resize_bilinear(ref, (8 * h, 8 * w))

    p = up2_packed(to_packed(xc, 1)) + to_packed(hx2, 2)
    p = up2_packed(p) + to_packed(hx1, 4)
    p = up2_packed(p)
    np.testing.assert_allclose(np.asarray(from_packed(p)), np.asarray(ref),
                               rtol=0, atol=1e-6)


def test_repack():
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((1, 8, 12, 3)), jnp.float32)
    p2 = to_packed(x, 2)
    p4 = repack(p2, 4)
    np.testing.assert_array_equal(np.asarray(from_packed(p4)), np.asarray(x))


def test_up2_bf16_stays_bf16():
    x = jnp.ones((1, 8, 8, 2), jnp.bfloat16)
    out = up2_packed(to_packed(x, 2))
    assert out.dtype == jnp.bfloat16
