"""Shape tests for the second zoo wave (FastSCNN/ERFNet/CGNet/ICNet/HRNet/
MobileNet)."""
import pytest
import jax
import jax.numpy as jnp
import numpy as np

from lednet_tpu.registry import MODELS
import lednet_tpu.models  # noqa: F401


def _run(model, x):
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    return model.apply(variables, x, train=False)


def test_fast_scnn_shapes():
    model = MODELS.build(dict(type='FastSCNN',
                              downsample_dw_channels=(8, 12),
                              global_in_channels=16,
                              global_block_channels=(16, 24, 32),
                              global_out_channels=32,
                              higher_in_channels=16, lower_in_channels=32,
                              fusion_out_channels=32))
    higher, lower, fusion = _run(model, jnp.zeros((1, 64, 64, 3)))
    assert higher.shape == (1, 8, 8, 16)
    assert lower.shape == (1, 2, 2, 32)
    assert fusion.shape == (1, 8, 8, 32)


def test_erfnet_shapes():
    model = MODELS.build(dict(type='ERFNet',
                              enc_downsample_channels=(4, 8, 16),
                              enc_stage_non_bottlenecks=(2, 2),
                              enc_non_bottleneck_dilations=(2, 4),
                              dec_upsample_channels=(8, 4),
                              dec_stages_non_bottleneck=(1, 1),
                              dec_non_bottleneck_channels=(8, 4)))
    (out,) = _run(model, jnp.zeros((1, 64, 64, 3)))
    assert out.shape == (1, 32, 32, 4)


def test_cgnet_shapes():
    model = MODELS.build(dict(type='CGNet', num_channels=(8, 16, 32),
                              num_blocks=(2, 3)))
    o0, o1, o2 = _run(model, jnp.zeros((1, 64, 64, 3)))
    assert o0.shape == (1, 32, 32, 8 + 3)
    assert o1.shape[1:3] == (16, 16)
    assert o2.shape == (1, 8, 8, 64)


def test_hrnet_shapes():
    extra = dict(
        stage1=dict(num_modules=1, num_branches=1, block='BOTTLENECK',
                    num_blocks=(1,), num_channels=(8,)),
        stage2=dict(num_modules=1, num_branches=2, block='BASIC',
                    num_blocks=(1, 1), num_channels=(4, 8)),
        stage3=dict(num_modules=1, num_branches=3, block='BASIC',
                    num_blocks=(1, 1, 1), num_channels=(4, 8, 16)))
    model = MODELS.build(dict(type='HRNet', extra=extra))
    outs = _run(model, jnp.zeros((1, 64, 64, 3)))
    assert [o.shape for o in outs] == [(1, 16, 16, 4), (1, 8, 8, 8),
                                       (1, 4, 4, 16)]


def test_mobilenet_v2_shapes():
    model = MODELS.build(dict(type='MobileNetV2', widen_factor=1.0,
                              strides=(1, 2, 2, 2, 1, 1, 1),
                              dilations=(1, 1, 1, 1, 1, 2, 4),
                              out_indices=(1, 2, 4, 6)))
    outs = _run(model, jnp.zeros((1, 64, 64, 3)))
    assert outs[0].shape == (1, 16, 16, 24)
    assert outs[-1].shape == (1, 4, 4, 320)


@pytest.mark.slow
def test_mobilenet_v3_shapes():
    model = MODELS.build(dict(type='MobileNetV3', arch='small',
                              out_indices=(0, 1, 8)))
    outs = _run(model, jnp.zeros((1, 64, 64, 3)))
    assert outs[0].shape[-1] == 16
    assert all(np.isfinite(np.asarray(o)).all() for o in outs)
