"""Pallas kernel tests (interpret mode on the CPU test backend; the compiled
path is exercised on real TPU by bench.py / the LEDHead predict gate)."""
import numpy as np
import pytest

import jax.numpy as jnp

from lednet_tpu.ops.pallas.upsample import (resize_add_nhwc, resize_nhwc)
from lednet_tpu.ops.resize import resize_bilinear


def test_resize_add_matches_gather(rng):
    x = jnp.asarray(rng.standard_normal((2, 24, 40, 2)).astype(np.float32))
    skip = jnp.asarray(rng.standard_normal((2, 48, 80, 2)).astype(np.float32))
    ref = resize_bilinear(x, (48, 80)) + skip
    out = resize_add_nhwc(x, skip, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_resize_noskip_matches_gather(rng):
    x = jnp.asarray(rng.standard_normal((1, 16, 24, 3)).astype(np.float32))
    ref = resize_bilinear(x, (33, 51))  # non-integer ratio
    out = resize_nhwc(x, (33, 51), interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_pyramid_matches_reference_path(rng):
    from lednet_tpu.ops.pallas import upsample as U
    # interpret-mode monkeypatch of the kernels inside pallas_pyramid
    x_c = jnp.asarray(rng.standard_normal((1, 12, 20, 2)).astype(np.float32))
    hx2 = jnp.asarray(rng.standard_normal((1, 24, 40, 2)).astype(np.float32))
    hx1 = jnp.asarray(rng.standard_normal((1, 48, 80, 2)).astype(np.float32))
    size = (96, 160)
    ref = hx2 + resize_bilinear(x_c, (24, 40))
    ref = hx1 + resize_bilinear(ref, (48, 80))
    ref = resize_bilinear(ref, size)
    r = U.resize_add_nhwc(x_c, hx2, interpret=True)
    r = U.resize_add_nhwc(r, hx1, interpret=True)
    out = U.resize_nhwc(r, size, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)
