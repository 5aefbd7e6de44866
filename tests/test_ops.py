"""Parity tests for the exactness-critical ops against torch CPU."""
import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from lednet_tpu.ops import (adaptive_avg_pool2d, avg_pool2d, max_pool2d,
                            resize_bilinear, resize_nearest)


def nchw(x_nhwc):
    return torch.from_numpy(np.ascontiguousarray(x_nhwc.transpose(0, 3, 1, 2)))


def to_nhwc(t_nchw):
    return t_nchw.numpy().transpose(0, 2, 3, 1)


@pytest.mark.parametrize('in_size,out_size', [
    ((16, 32), (64, 128)),   # upsample x4 (LED logit pyramid)
    ((64, 128), (16, 32)),   # downsample (no antialias in torch)
    ((17, 31), (64, 128)),   # odd sizes (math.ceil sizing path)
    ((64, 128), (63, 127)),  # near-identity shrink
    ((8, 8), (8, 8)),        # identity
])
@pytest.mark.parametrize('align_corners', [False, True])
def test_resize_bilinear_matches_torch(rng, in_size, out_size, align_corners):
    x = rng.standard_normal((2, *in_size, 5), dtype=np.float32)
    ours = np.asarray(resize_bilinear(jnp.asarray(x), out_size, align_corners))
    ref = to_nhwc(F.interpolate(nchw(x), size=out_size, mode='bilinear',
                                align_corners=align_corners))
    np.testing.assert_allclose(ours, ref, atol=1e-4, rtol=1e-4)


@pytest.mark.parametrize('in_size,out_size', [
    ((16, 32), (64, 128)),
    ((64, 128), (16, 32)),
    ((17, 31), (64, 128)),
])
def test_resize_nearest_matches_torch(rng, in_size, out_size):
    x = rng.standard_normal((2, *in_size, 3), dtype=np.float32)
    ours = np.asarray(resize_nearest(jnp.asarray(x), out_size))
    ref = to_nhwc(F.interpolate(nchw(x), size=out_size, mode='nearest'))
    np.testing.assert_allclose(ours, ref, atol=1e-6)


@pytest.mark.parametrize('in_size,factor', [
    ((7, 9), 0.5),     # odd sizes: coordinate ratio 2.0 != in/out (7/3)
    ((63, 45), 0.5),
    ((13, 17), 1.7),   # fractional upsample
])
@pytest.mark.parametrize('mode', ['bilinear', 'nearest', 'bicubic'])
def test_resize_scale_factor_matches_torch(rng, in_size, factor, mode):
    # torch maps coordinates with the PASSED scale_factor, not the
    # in/out-size ratio (area_pixel_compute_scale) — on odd sizes the two
    # differ; regression guard for the ICNet fix (commit 726ff70)
    from lednet_tpu.ops.resize import resize
    x = rng.standard_normal((2, *in_size, 3), dtype=np.float32)
    ours = np.asarray(resize(jnp.asarray(x), scale_factor=factor, mode=mode,
                             align_corners=False if mode != 'nearest' else None))
    kwargs = {} if mode == 'nearest' else dict(align_corners=False)
    ref = to_nhwc(F.interpolate(nchw(x), scale_factor=factor, mode=mode,
                                recompute_scale_factor=False, **kwargs))
    np.testing.assert_allclose(ours, ref, atol=1e-4, rtol=1e-4)


@pytest.mark.parametrize('k,s,p', [(5, 2, 2), (9, 4, 4), (17, 8, 8), (3, 2, 1), (3, 1, 1)])
def test_avg_pool_matches_torch(rng, k, s, p):
    # DAPPM scales use AvgPool2d(5,2,2)/(9,4,4)/(17,8,8) w/ count_include_pad
    x = rng.standard_normal((2, 32, 64, 4), dtype=np.float32)
    ours = np.asarray(avg_pool2d(jnp.asarray(x), k, s, p))
    ref = to_nhwc(F.avg_pool2d(nchw(x), k, stride=s, padding=p))
    np.testing.assert_allclose(ours, ref, atol=1e-5, rtol=1e-5)


def test_max_pool_matches_torch(rng):
    x = rng.standard_normal((2, 32, 32, 4), dtype=np.float32)
    ours = np.asarray(max_pool2d(jnp.asarray(x), 3, 2, 1))
    ref = to_nhwc(F.max_pool2d(nchw(x), 3, stride=2, padding=1))
    np.testing.assert_allclose(ours, ref, atol=1e-6)


@pytest.mark.parametrize('out_size', [(1, 1), (4, 4), (8, 8), (16, 16), (3, 5)])
def test_adaptive_avg_pool_matches_torch(rng, out_size):
    # Muti_AFF context paths use AdaptiveAvgPool2d((4,4)/(8,8)/(16,16))
    x = rng.standard_normal((2, 33, 57, 4), dtype=np.float32)
    ours = np.asarray(adaptive_avg_pool2d(jnp.asarray(x), out_size))
    ref = to_nhwc(F.adaptive_avg_pool2d(nchw(x), out_size))
    np.testing.assert_allclose(ours, ref, atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize('in_size,out_size,align',
                         [((14, 14), (32, 32), False),
                          ((7, 9), (20, 5), False),
                          ((16, 16), (9, 9), False),
                          ((14, 14), (32, 32), True)])
def test_resize_bicubic_matches_torch(rng, in_size, out_size, align):
    import torch
    import torch.nn.functional as F
    from lednet_tpu.ops.resize import resize_bicubic
    x = rng.standard_normal((2,) + in_size + (3,)).astype(np.float32)
    out_j = np.asarray(resize_bicubic(jnp.asarray(x), out_size, align))
    xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
    out_t = F.interpolate(xt, size=out_size, mode='bicubic',
                          align_corners=align)
    np.testing.assert_allclose(out_j, out_t.numpy().transpose(0, 2, 3, 1),
                               atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize('h,w,k,s,p,cip',
                         [(7, 7, 2, 2, 0, False), (9, 11, 3, 2, 1, True),
                          (10, 7, 3, 2, 1, False), (5, 5, 5, 3, 2, True)])
def test_avg_pool_ceil_mode_matches_torch(rng, h, w, k, s, p, cip):
    import torch.nn.functional as F
    import torch
    from lednet_tpu.ops.pool import avg_pool2d
    x = rng.standard_normal((2, h, w, 3)).astype(np.float32)
    out_j = np.asarray(avg_pool2d(jnp.asarray(x), k, s, p,
                                  count_include_pad=cip, ceil_mode=True))
    xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
    out_t = F.avg_pool2d(xt, k, s, p, ceil_mode=True, count_include_pad=cip)
    tt = out_t.numpy().transpose(0, 2, 3, 1)
    assert out_j.shape == tt.shape
    np.testing.assert_allclose(out_j, tt, atol=1e-6, rtol=1e-6)
