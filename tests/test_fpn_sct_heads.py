"""FPNHead (Semantic FPN) + SCTHead tests: scale-head upsample chains,
summation at the finest stride, and SCTNet's pre-activation head paired
with the SCTNet backbone."""
import jax
import jax.numpy as jnp
import numpy as np

from lednet_tpu.registry import MODELS
import lednet_tpu.models  # noqa: F401


def test_fpn_head_shapes(rng):
    head = MODELS.build(dict(type='FPNHead', in_channels=(8, 8, 8, 8),
                             channels=8, num_classes=5,
                             feature_strides=(4, 8, 16, 32),
                             dropout_ratio=0.0))
    feats = [jnp.asarray(rng.standard_normal(
        (1, 16 // (2 ** i), 16 // (2 ** i), 8)), jnp.float32)
        for i in range(4)]
    v = head.init(jax.random.PRNGKey(0), feats, train=False)
    out = head.apply(v, feats, train=False)
    assert out.shape == (1, 16, 16, 5)  # finest stride's resolution
    losses = head.loss_by_feat(out, jnp.zeros((1, 64, 64), jnp.int32))
    assert np.isfinite(float(losses['loss_ce']))


def test_fpn_segmentor_pairing():
    model = MODELS.build(dict(
        type='EncoderDecoder',
        backbone=dict(type='ResNet', depth=18, base_channels=8,
                      stem_channels=8, out_indices=(0, 1, 2, 3)),
        neck=dict(type='FPN', in_channels=[8, 16, 32, 64], out_channels=8,
                  num_outs=4),
        decode_head=dict(type='FPNHead', in_channels=(8, 8, 8, 8),
                         channels=8, num_classes=5,
                         feature_strides=(4, 8, 16, 32)),
        test_cfg=dict(mode='whole')))
    x = jnp.zeros((1, 64, 64, 3))
    v = model.init({'params': jax.random.PRNGKey(0),
                    'dropout': jax.random.PRNGKey(1)}, x, train=False)
    pred = model.apply(v, x, method='predict')
    assert pred.shape == (1, 64, 64, 5)


def test_sct_head_with_sctnet(rng):
    head = MODELS.build(dict(type='SCTHead', in_channels=16, channels=8,
                             num_classes=3, dropout_ratio=0.0, in_index=0))
    feats = [jnp.asarray(rng.standard_normal((1, 8, 8, 16)), jnp.float32)]
    v = head.init(jax.random.PRNGKey(0), feats, train=False)
    out = head.apply(v, feats, train=False)
    assert out.shape == (1, 8, 8, 3)
