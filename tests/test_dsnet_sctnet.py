"""DSNet and SCTNet shape tests."""
import pytest
import jax
import jax.numpy as jnp
import numpy as np

from lednet_tpu.registry import MODELS
import lednet_tpu.models  # noqa: F401

pytestmark = pytest.mark.slow  # whole-network transplant / long-run tier


def test_dsnet_shapes():
    model = MODELS.build(dict(type='DSNet', m=2, n=2, num_classes=5,
                              planes=8, augment=True))
    x = jnp.zeros((1, 64, 64, 3))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    aux_p, main, aux_d = model.apply(variables, x, train=False)
    assert main.shape == (1, 64, 64, 5)
    assert aux_p.shape == (1, 64, 64, 5)
    assert aux_d.shape == (1, 64, 64, 5)
    assert np.isfinite(np.asarray(main)).all()


def test_sctnet_shapes():
    model = MODELS.build(dict(type='SCTNet', base_channels=8,
                              spp_channels=16, num_heads=2))
    x = jnp.zeros((1, 64, 64, 3))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    x_out, x2 = model.apply(variables, x, train=False)
    assert x_out.shape == (1, 8, 8, 32)   # 4c @ 1/8
    assert x2.shape == (1, 8, 8, 16)      # 2c @ 1/8
    assert np.isfinite(np.asarray(x_out)).all()
