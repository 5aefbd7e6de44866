"""The space-to-depth stem/head reparameterization is exact.

LEDNet's eval path (``stem_impl='s2d'``) recomputes stem_conv1/stem_conv2
and the LEDHead's head_x1 as space-to-depth-packed convolutions with BN
running stats folded in (``lednet_tpu/ops/s2d.py``) — a pure MXU-shaping
reparameterization that must be numerically identical to the plain
('conv') lowering.  Behavioral spec: reference stem
``tools/speed/ddrnet_speed.py:40-120`` (conv1/conv2) and
``mmseg/models/decode_heads/led_head.py`` ``_make_base_head``.
"""
import jax
import jax.numpy as jnp
import jax.tree_util as jtu
import numpy as np
import pytest

import lednet_tpu
from lednet_tpu.registry import MODELS

lednet_tpu.register_all_modules()


def _jitter(v, rng):
    params = jtu.tree_map(
        lambda a: a + jnp.asarray(rng.standard_normal(a.shape) * 0.05,
                                  a.dtype), v['params'])
    stats = jtu.tree_map(
        lambda a: jnp.abs(a + jnp.asarray(rng.standard_normal(a.shape) * 0.05,
                                          a.dtype)), v['batch_stats'])
    return {'params': params, 'batch_stats': stats}


def _build(stem):
    return MODELS.build(dict(
        type='EncoderDecoder',
        backbone=dict(type='LEDNet', in_channels=3, channels=16,
                      ppm_channels=64, stem_impl=stem),
        decode_head=dict(type='LEDHead', in_channels=64, channels=32,
                         dropout_ratio=0.0, num_classes=2),
        test_cfg=dict(mode='whole')))


def test_s2d_predict_matches_conv_stem():
    m_s2d, m_conv = _build('s2d'), _build('conv')
    x = jnp.asarray(np.random.default_rng(0).standard_normal((2, 64, 96, 3)),
                    jnp.float32)
    v = jax.jit(lambda: m_s2d.init(jax.random.PRNGKey(0), x,
                                   method='predict'))()
    v = _jitter(v, np.random.default_rng(1))
    o_s2d = jax.jit(lambda v, x: m_s2d.apply(v, x, method='predict'))(v, x)
    o_conv = jax.jit(lambda v, x: m_conv.apply(v, x, method='predict'))(v, x)
    rel = float(jnp.abs(o_s2d - o_conv).max() / jnp.abs(o_conv).max())
    assert rel < 1e-5, rel


def test_s2d_falls_back_on_indivisible_sizes():
    # H or W not divisible by 4 -> the plain path runs; predict still works
    m = _build('s2d')
    x = jnp.asarray(np.random.default_rng(0).standard_normal((1, 66, 98, 3)),
                    jnp.float32)
    v = jax.jit(lambda: m.init(jax.random.PRNGKey(0), x, method='predict'))()
    out = jax.jit(lambda v, x: m.apply(v, x, method='predict'))(v, x)
    assert out.shape == (1, 66, 98, 2)


def test_s2d_weight_builders_exact():
    from lednet_tpu.ops.s2d import (depth_to_space, pack_s1_conv2d_weights,
                                    pack_s2_conv_weights, s1_conv2d_packed,
                                    s2_conv_packed, space_to_depth)
    rng = np.random.default_rng(0)

    def conv(x, w, s):
        return jax.lax.conv_general_dilated(
            x, w, (s, s), ((1, 1), (1, 1)),
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'))

    # stride-2 from 4x4-packed input, 2x2-packed output
    x = jnp.asarray(rng.standard_normal((2, 48, 64, 3)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((3, 3, 3, 32)) * 0.1, jnp.float32)
    ref = conv(x, w, 2)
    out = depth_to_space(
        s2_conv_packed(space_to_depth(x, 4), pack_s2_conv_weights(w, 2)), 2)
    assert float(jnp.abs(ref - out).max() / jnp.abs(ref).max()) < 1e-5

    # stride-2 from 2x2-packed input, unpacked output
    x2 = jnp.asarray(rng.standard_normal((2, 48, 64, 32)), jnp.float32)
    w2 = jnp.asarray(rng.standard_normal((3, 3, 32, 32)) * 0.1, jnp.float32)
    ref2 = conv(x2, w2, 2)
    out2 = s2_conv_packed(space_to_depth(x2, 2), pack_s2_conv_weights(w2, 1))
    assert float(jnp.abs(ref2 - out2).max() / jnp.abs(ref2).max()) < 1e-5

    # stride-1 on 2x2-packed cells
    x3 = jnp.asarray(rng.standard_normal((2, 24, 32, 32)), jnp.float32)
    w3 = jnp.asarray(rng.standard_normal((3, 3, 32, 2)) * 0.1, jnp.float32)
    ref3 = conv(x3, w3, 1)
    out3 = depth_to_space(
        s1_conv2d_packed(space_to_depth(x3, 2), pack_s1_conv2d_weights(w3, 2)),
        2)
    assert float(jnp.abs(ref3 - out3).max() / jnp.abs(ref3).max()) < 1e-5
