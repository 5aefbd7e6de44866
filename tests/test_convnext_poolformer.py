"""Shape/semantics tests for the ConvNeXt and PoolFormer backbones (the
reference consumes these from mmpretrain in configs/_base_/models/
upernet_convnext.py and fpn_poolformer_s12.py)."""
import pytest
import jax
import jax.numpy as jnp
import numpy as np

from lednet_tpu.registry import MODELS
import lednet_tpu.models  # noqa: F401

pytestmark = pytest.mark.slow  # whole-network transplant / long-run tier


def _run(model, x):
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    return model.apply(variables, x, train=False)


def test_convnext_tiny_shapes():
    model = MODELS.build(dict(type='ConvNeXt', arch='tiny',
                              out_indices=(0, 1, 2, 3)))
    outs = _run(model, jnp.zeros((1, 64, 64, 3)))
    assert [o.shape for o in outs] == [
        (1, 16, 16, 96), (1, 8, 8, 192), (1, 4, 4, 384), (1, 2, 2, 768)]


def test_convnext_custom_arch_and_alias():
    # dict arch + the mmpretrain.-scoped alias used by the reference config
    model = MODELS.build(dict(type='mmpretrain.ConvNeXt',
                              arch=dict(depths=(1, 1), channels=(8, 16)),
                              out_indices=(0, 1),
                              layer_scale_init_value=1.0))
    o0, o1 = _run(model, jnp.zeros((2, 32, 32, 3)))
    assert o0.shape == (2, 8, 8, 8) and o1.shape == (2, 4, 4, 16)


def test_poolformer_s12_shapes():
    model = MODELS.build(dict(type='PoolFormer', arch='s12',
                              out_indices=(0, 2, 4, 6)))
    outs = _run(model, jnp.zeros((1, 64, 64, 3)))
    assert [o.shape for o in outs] == [
        (1, 16, 16, 64), (1, 8, 8, 128), (1, 4, 4, 320), (1, 2, 2, 512)]


def test_poolformer_token_mixer_is_zero_at_init():
    """At init (layer scale ~1e-5) the block must be near-identity, and the
    pool-minus-identity mixer must average with count_include_pad=False
    semantics: a constant input stays exactly constant under the mixer."""
    from lednet_tpu.ops.pool import avg_pool2d

    def mixer_pool(x):
        return avg_pool2d(x, 3, 1, 1, count_include_pad=False)

    x = jnp.full((1, 5, 7, 3), 2.5)
    np.testing.assert_allclose(np.asarray(mixer_pool(x)),
                               np.asarray(x), rtol=1e-6)
    # non-constant input: corners see only a 2x2 window
    y = jnp.arange(9, dtype=jnp.float32).reshape(1, 3, 3, 1)
    pooled = np.asarray(mixer_pool(y))[0, :, :, 0]
    assert abs(pooled[0, 0] - np.mean([0, 1, 3, 4])) < 1e-6
    assert abs(pooled[1, 1] - 4.0) < 1e-6
