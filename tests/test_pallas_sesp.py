"""Fused SESP pyramid kernel: equality against the conv formulation (CPU
interpret mode) and through the SESP module gate."""
import functools

import numpy as np
import pytest

import jax
import jax.numpy as jnp


@pytest.fixture()
def interpret_pallas(monkeypatch):
    from jax.experimental import pallas as pl
    import lednet_tpu.ops.pallas.sesp as S
    monkeypatch.setattr(S.pl, 'pallas_call',
                        functools.partial(pl.pallas_call, interpret=True))
    return S


@pytest.mark.parametrize('rates,H,W,n,B', [
    ((1, 1, 1, 1), 24, 40, 16, 2),
    ((1, 1, 2, 3), 12, 20, 32, 1),
    ((1, 2), 9, 11, 8, 1),
])
def test_pyramid_matches_convs(interpret_pallas, rates, H, W, n, B, rng):
    S = interpret_pallas
    x = jnp.asarray(rng.standard_normal((B, H, W, n)), jnp.float32)
    k = len(rates)
    dw = jnp.asarray(rng.standard_normal((k, 3, 3, n)), jnp.float32)
    v2 = jnp.asarray(rng.standard_normal((k, 3, 3, n)), jnp.float32)
    got = S.sesp_pyramid.__wrapped__(x, dw, v2, rates)
    ref = S.sesp_pyramid_reference(x, dw, v2, rates)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-4, rtol=1e-4)


def test_sesp_module_gate_equality(interpret_pallas, monkeypatch, rng):
    """SESP(use_pallas=True) must match the conv path bit-for-bit at the
    module level (same params, train=False)."""
    from lednet_tpu.models.espnet import SESP
    x = jnp.asarray(rng.standard_normal((1, 60, 64, 32)), jnp.float32)
    mod_conv = SESP(32, 32, spatial=False, use_pallas=False)
    variables = mod_conv.init(jax.random.PRNGKey(0), x, train=False)
    ref = mod_conv.apply(variables, x, train=False)

    monkeypatch.setattr(jax, 'default_backend', lambda: 'tpu')
    mod_pal = SESP(32, 32, spatial=False, use_pallas=True)
    got = mod_pal.apply(variables, x, train=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-4, rtol=1e-3)
