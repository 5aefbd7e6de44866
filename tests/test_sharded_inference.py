"""Spatially-sharded whole inference (lednet_tpu/parallel/
sharded_inference.py): the sharded forward must reproduce the unsharded
forward — GSPMD halo exchanges are an implementation detail, not a
semantic change."""
import pytest
import jax
import jax.numpy as jnp
import numpy as np

from lednet_tpu.registry import MODELS
import lednet_tpu.models  # noqa: F401

pytestmark = pytest.mark.slow  # whole-network transplant / long-run tier


def _model():
    return MODELS.build(dict(
        type='EncoderDecoder',
        backbone=dict(type='LEDNet', channels=8, ppm_channels=32),
        decode_head=dict(type='LEDHead', in_channels=32, channels=16,
                         dropout_ratio=0.0, num_classes=2),
        test_cfg=dict(mode='whole')))


def test_sharded_predict_matches_single_device(rng):
    from lednet_tpu.parallel import make_mesh, sharded_predict
    model = _model()
    x = jnp.asarray(rng.integers(0, 255, (1, 96, 128, 3)), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    ref = model.apply(variables, x, method='predict')

    mesh = make_mesh(jax.devices()[:4], axis_name='spatial')
    out = sharded_predict(model, variables, x, mesh=mesh)
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-3, atol=1e-2)  # cross-device reduction reassociation


def test_sharded_predict_pads_odd_sizes(rng):
    from lednet_tpu.parallel import make_mesh, sharded_predict
    model = _model()
    x = jnp.asarray(rng.integers(0, 255, (1, 70, 90, 3)), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    mesh = make_mesh(jax.devices()[:2], axis_name='spatial')
    out = sharded_predict(model, variables, x, mesh=mesh)
    assert out.shape == (1, 70, 90, 2)


def test_sharded_predict_with_preprocessor(rng):
    from lednet_tpu.models.data_preprocessor import SegDataPreProcessor
    from lednet_tpu.parallel import make_mesh, sharded_predict
    model = _model()
    pre = SegDataPreProcessor(mean=[123.675, 116.28, 103.53],
                              std=[58.395, 57.12, 57.375], bgr_to_rgb=True)
    raw = jnp.asarray(rng.integers(0, 255, (1, 64, 64, 3)), jnp.uint8)
    x, _, _ = pre(raw, None, training=False)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    ref = model.apply(variables, x, method='predict')
    mesh = make_mesh(jax.devices()[:4], axis_name='spatial')
    out = sharded_predict(model, variables, raw, mesh=mesh, preprocessor=pre)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-3, atol=1e-2)  # cross-device reduction reassociation
