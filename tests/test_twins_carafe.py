"""Twins backbones + CARAFE upsampler tests."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lednet_tpu.registry import MODELS
import lednet_tpu.models  # noqa: F401
import lednet_tpu.ops  # noqa: F401

pytestmark = pytest.mark.slow  # whole-network transplant / long-run tier


@pytest.mark.parametrize('btype', ['PCPVT', 'SVT'])
def test_twins_shapes(btype):
    model = MODELS.build(dict(type=btype, embed_dims=(8, 16, 24, 32),
                              num_heads=(1, 2, 2, 4), depths=(1, 2, 1, 1),
                              mlp_ratios=(2, 2, 2, 2)))
    x = jnp.zeros((1, 64, 64, 3))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    outs = model.apply(variables, x, train=False)
    assert [o.shape[-1] for o in outs] == [8, 16, 24, 32]
    assert outs[0].shape[1:3] == (16, 16)


def test_carafe_upsampler():
    mod = MODELS.build(dict(type='CARAFE', inC=8, outC=8, kernel_size=3,
                            up_factor=2))
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((1, 8, 8, 8)), jnp.float32)
    variables = mod.init(jax.random.PRNGKey(0), x, train=False)
    out = mod.apply(variables, x, train=False)
    assert out.shape == (1, 16, 16, 8)
    assert np.isfinite(np.asarray(out)).all()


def test_multimodal_is_registered():
    # the gated stub became a real segmentor (tests/test_san.py)
    mod = MODELS.get('MultimodalEncoderDecoder')
    assert mod is not None and hasattr(mod, 'predict')
