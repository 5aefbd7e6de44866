"""Interpret-mode parity for the Pallas TPU kernels (VERDICT r4 #5).

These kernels are the DEFAULT eval path on TPU (``espnet.py``,
``lednet.py``, ``data_preprocessor.py``) but the forced-CPU suite never
executed them — correctness rested on the hand-run rig
``tools/speed/check_pallas_sesp.py``.  Here every kernel runs under the
Pallas interpreter (``interpret=True`` — same kernel program, executed by
the JAX interpreter on CPU) against an independent jnp formulation, so a
Mosaic/libtpu or kernel-logic regression is caught by CI.  The on-chip
compiled path is additionally exercised by the verify drive / bench.

Reference semantics being checked: SESP pyramid per
``mmseg/models/nn_layers/eesp.py:15-118``; stem convs per the LED-Net stem
(``tools/speed/ddrnet_speed.py:40-60``); BasicBlock pair per
``mmseg/models/utils/basic_block.py:13-75``.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lednet_tpu.ops.pallas.conv_block import basic_pair_packed
from lednet_tpu.ops.pallas.s2d_input import normalize_s2d
from lednet_tpu.ops.pallas.sesp_pyramid import sesp_block, sesp_pyramid
from lednet_tpu.ops.pallas.stem_conv import stem_convs_packed
from lednet_tpu.models.espnet import _dw_shift
from lednet_tpu.ops.s2d import (pack_s1_conv_weights, pack_s2_conv_weights,
                                s2_conv_packed, space_to_depth)


def _rel_err(a, b):
    a = np.asarray(a, np.float32)
    b = np.asarray(b, np.float32)
    return np.abs(a - b).max() / (np.abs(a).max() + 1e-8)


# ---------------------------------------------------------------- s2d input
@pytest.mark.parametrize('shape,normalize', [
    ((1, 32, 128, 3), True),
    ((2, 16, 256, 3), True),
    ((1, 32, 128, 3), False),
])
def test_normalize_s2d_matches_unfused(rng, shape, normalize):
    x = jnp.asarray(rng.integers(0, 255, shape), jnp.float32)
    mean = jnp.asarray([123.675, 116.28, 103.53])
    std = jnp.asarray([58.395, 57.12, 57.375])
    if normalize:
        out = normalize_s2d(x, mean, std, interpret=True)
        ref = space_to_depth(((x - mean) / std).astype(jnp.bfloat16), 4)
    else:
        out = normalize_s2d(x, interpret=True)
        ref = space_to_depth(x.astype(jnp.bfloat16), 4)
    # the kernel's one-hot MXU routing moves bf16 values exactly
    assert out.dtype == jnp.bfloat16
    np.testing.assert_array_equal(np.asarray(out, np.float32),
                                  np.asarray(ref, np.float32))


# ---------------------------------------------------------------- stem convs
@pytest.mark.parametrize('dtype,tol', [(jnp.float32, 1e-5),
                                       (jnp.bfloat16, 2e-2)])
def test_stem_convs_packed_matches_s2_conv(rng, dtype, tol):
    Hc, Wc, c = 12, 16, 8
    xp = jnp.asarray(rng.standard_normal((2, Hc, Wc, 48)), dtype)
    w1 = jnp.asarray(rng.standard_normal((3, 3, 3, c)) * 0.2, jnp.float32)
    w2 = jnp.asarray(rng.standard_normal((3, 3, c, c)) * 0.2, jnp.float32)
    b1 = jnp.asarray(rng.standard_normal(c), jnp.float32)
    b2 = jnp.asarray(rng.standard_normal(c), jnp.float32)
    wb1 = pack_s2_conv_weights(w1, 2).astype(dtype)     # 4x4 in -> 2x2 out
    wb2 = pack_s2_conv_weights(w2, 1).astype(dtype)     # 2x2 in -> plain out
    b1t = jnp.tile(b1, 4)[None]
    h, x2 = stem_convs_packed(xp, wb1, b1t, wb2, b2[None], interpret=True)
    h_ref = jax.nn.relu(s2_conv_packed(xp, wb1)
                        + jnp.tile(b1, 4).astype(dtype))
    x2_ref = jax.nn.relu(s2_conv_packed(h_ref, wb2) + b2.astype(dtype))
    assert _rel_err(h, h_ref) < tol
    assert _rel_err(x2, x2_ref) < tol


# ------------------------------------------------------------ BasicBlock pair
def _conv3x3(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'))


def test_basic_pair_matches_unfused(rng):
    B, H, W, C = 1, 8, 16, 32
    x = jnp.asarray(rng.standard_normal((B, H, W, C)), jnp.float32)
    ws = [jnp.asarray(rng.standard_normal((3, 3, C, C)) * 0.1, jnp.float32)
          for _ in range(4)]
    bs = [jnp.asarray(rng.standard_normal(C) * 0.1, jnp.float32)
          for _ in range(4)]
    wb = jnp.stack([pack_s1_conv_weights(w, 4) for w in ws])
    bb = jnp.stack([jnp.tile(b, 4)[None] for b in bs])
    xp = x.reshape(B, H, W // 4, 4 * C)
    out = basic_pair_packed(xp, wb, bb, interpret=True) \
        .reshape(B, H, W, C)
    h = jax.nn.relu(_conv3x3(x, ws[0]) + bs[0])
    b1 = jax.nn.relu(_conv3x3(h, ws[1]) + bs[1] + x)       # act_out=True
    h = jax.nn.relu(_conv3x3(b1, ws[2]) + bs[2])
    ref = jax.nn.relu(_conv3x3(h, ws[3]) + bs[3] + b1)     # trailing ReLU
    assert _rel_err(out, ref) < 1e-5


# ------------------------------------------------------------- SESP pyramid
def _pyramid_ref(red, dw1, dw2, rates, stride):
    # _dw_shift takes the flax depthwise layout (3, 3, 1, n)
    dw = lambda k: k[:, :, None, :]
    branches = []
    for i, d in enumerate(rates):
        b = _dw_shift(red, dw(dw1[i]), d, stride)
        if branches:
            b = b + branches[-1]                           # HFF prefix sum
        branches.append(b)
    if dw2 is not None:
        branches = [_dw_shift(b, dw(dw2[i]), d + 1)
                    for i, (b, d) in enumerate(zip(branches, rates))]
    return jnp.concatenate(branches, -1)


@pytest.mark.parametrize('stride,with_v2', [(1, True), (1, False),
                                            (2, True)])
def test_sesp_pyramid_matches_shift_form(rng, stride, with_v2):
    H, W, n, rates = 12, 20, 16, (1, 2, 3, 4)
    red = jnp.asarray(rng.standard_normal((2, H, W, n)), jnp.float32)
    dw1 = jnp.asarray(rng.standard_normal((4, 3, 3, n)) * 0.3, jnp.float32)
    dw2 = (jnp.asarray(rng.standard_normal((4, 3, 3, n)) * 0.3, jnp.float32)
           if with_v2 else None)
    out = sesp_pyramid(red, dw1, dw2, rates=rates, stride=stride,
                       interpret=True)
    ref = _pyramid_ref(red, dw1, dw2, rates, stride)
    assert _rel_err(out, ref) < 1e-5


# ------------------------------------------------------------ whole SESP block
def _prelu(x, a):
    return jnp.where(x >= 0, x, a * x)


@pytest.mark.parametrize('tail', ['residual', 'act', 'plain'])
def test_sesp_block_matches_jnp_replica(rng, tail):
    H, W, n, k = 10, 12, 8, 4
    rates = (1, 2, 3, 4)
    C = k * n
    Cin = C  # residual tail requires Cin == k*n
    f = lambda *s, sc=0.3: jnp.asarray(rng.standard_normal(s) * sc,
                                       jnp.float32)
    x = f(2, H, W, Cin, sc=1.0)
    wred, bred, a1 = f(Cin, n), f(n), f(n, sc=0.1)
    dw1, dw2 = f(k, 3, 3, n), f(k, 3, 3, n)
    s2, b2, a2 = 1 + f(C, sc=0.1), f(C), f(C, sc=0.1)
    wexp, bexp, a3 = f(C, C, sc=0.1), f(C), f(C, sc=0.1)
    out = sesp_block(x, wred, bred, a1, dw1, dw2, s2, b2, a2, wexp, bexp,
                     a3, rates=rates, tail=tail, exact=True,
                     interpret=True)
    red = _prelu(jnp.einsum('bhwi,io->bhwo', x, wred) + bred, a1)
    pyr = _pyramid_ref(red, dw1, dw2, rates, 1)
    y = _prelu(pyr * s2 + b2, a2)
    z = jnp.einsum('bhwi,io->bhwo', y, wexp) + bexp
    if tail == 'residual':
        ref = _prelu(z + x, a3)
    elif tail == 'act':
        ref = _prelu(z, a3)
    else:
        ref = z
    assert _rel_err(out, ref) < 1e-5


# ------------------------------------------------- timing-harness regression
def test_chain_slope_anchor_band():
    """The honest-clock harness itself (VERDICT r3 #8 / r4 weak #10): a
    known-cost matmul chain must yield a positive, sane slope on CPU.  A
    backend change that re-breaks the clock (acking dispatch, folding the
    chain, hoisting the ops) shows up here as a zero/negative/absurd
    slope long before it silently corrupts a BENCH record."""
    from lednet_tpu.utils.timing import chain_slope
    n = 384
    a = jnp.ones((n, n), jnp.float32)

    def mm(a, eps):
        return jnp.sum((a + eps.astype(a.dtype)) @ a) * jnp.float32(1.0)

    r = chain_slope(mm, (a,), k=(1, 9), reps=4)
    assert r['per_op_s'] > 0, 'chain slope must be positive'
    # 384^3 matmul = 0.11 GFLOP; any real CPU lands between 0.05 and
    # 5000 GFLOP/s — outside that the clock or the chain is broken
    gflops = 2 * n**3 / r['per_op_s'] / 1e9
    assert 0.05 < gflops < 5000, f'implausible CPU matmul rate {gflops}'
    # the k=9 chain must actually cost more wall than the k=1 chain
    assert r['walls'][9] > r['walls'][1]
