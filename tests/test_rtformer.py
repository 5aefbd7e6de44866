"""RTFormer (from-paper implementation; the reference ships only a broken
13-line stub): double-norm semantics, forward shape chain, and the full
EncoderDecoder pairing from the shipped config."""
import jax
import jax.numpy as jnp
import numpy as np

from lednet_tpu.registry import MODELS
import lednet_tpu.models  # noqa: F401


def _tiny(**kw):
    cfg = dict(type='RTFormer', base_channels=16, high_channels=32,
               num_heads=4, num_tokens=36, cross_size=4, ppm_channels=32)
    cfg.update(kw)
    return MODELS.build(cfg)


def test_double_norm_is_l1_over_external_axis():
    from lednet_tpu.models.backbones.rtformer import _double_norm
    rng = np.random.default_rng(0)
    attn = jnp.asarray(rng.standard_normal((2, 4, 10, 6)), jnp.float32)
    out = np.asarray(_double_norm(attn))
    assert out.min() >= 0
    np.testing.assert_allclose(out.sum(-1), 1.0, atol=1e-4)


def test_rtformer_forward_shapes():
    m = _tiny()
    x = jnp.zeros((2, 64, 128, 3))
    v = m.init(jax.random.PRNGKey(0), x, train=False)
    aux, out = m.apply(v, x, train=False)
    assert aux.shape == (2, 8, 16, 32)       # high branch @1/8
    assert out.shape == (2, 8, 16, 64)       # high + upsampled DAPPM
    # train mode mutates batch stats (BN everywhere incl. attention prenorm)
    _, mut = m.apply(v, x, train=True, mutable=['batch_stats'])
    assert mut['batch_stats']


def test_rtformer_encoder_decoder_train_and_predict():
    model = MODELS.build(dict(
        type='EncoderDecoder',
        backbone=dict(type='RTFormer', base_channels=16, high_channels=32,
                      num_heads=4, num_tokens=36, cross_size=4,
                      ppm_channels=32),
        decode_head=dict(type='FCNHead', in_channels=64, in_index=1,
                         channels=32, num_convs=1, concat_input=False,
                         dropout_ratio=0., num_classes=5),
        auxiliary_head=dict(type='FCNHead', in_channels=32, in_index=0,
                            channels=16, num_convs=1, concat_input=False,
                            dropout_ratio=0., num_classes=5),
        test_cfg=dict(mode='whole')))
    x = jnp.zeros((1, 64, 64, 3))
    labels = jnp.zeros((1, 64, 64), jnp.int32)
    rngs = {'params': jax.random.PRNGKey(0), 'dropout': jax.random.PRNGKey(1)}
    v = model.init(rngs, x, labels, method='loss')
    pred = model.apply(v, x, method='predict')
    assert pred.shape == (1, 64, 64, 5)
    losses, _ = model.apply(v, x, labels, method='loss', rngs=rngs,
                            mutable=['batch_stats'])
    assert any(k.startswith('decode.') for k in losses)
    assert any(k.startswith('aux') for k in losses)
    assert np.isfinite(float(sum(
        v for k, v in losses.items() if 'loss' in k)))


def test_rtformer_config_builds():
    from lednet_tpu.config import Config
    cfg = Config.fromfile(
        'configs/rtformer/rtformer-slim_cityscapes-1024x1024.py')
    assert cfg.model['backbone']['base_channels'] == 32
    model = MODELS.build(dict(cfg.model))
    assert model is not None
