"""MaskFormer-family head tests: forward shapes, Hungarian-matched losses,
semantic composition."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lednet_tpu.registry import MODELS
import lednet_tpu.models  # noqa: F401


@pytest.mark.parametrize('head_type', ['MaskFormerHead', 'Mask2FormerHead'])
def test_maskformer_forward_loss_predict(head_type):
    head = MODELS.build(dict(
        type=head_type, in_channels=[8, 16, 32, 32], channels=16,
        feat_channels=16, num_queries=8, num_transformer_decoder_layers=2,
        num_heads=2, num_classes=4, in_index=[0, 1, 2, 3]))
    rng = np.random.default_rng(0)
    feats = [jnp.asarray(rng.standard_normal((1, 16, 16, 8)), jnp.float32),
             jnp.asarray(rng.standard_normal((1, 8, 8, 16)), jnp.float32),
             jnp.asarray(rng.standard_normal((1, 4, 4, 32)), jnp.float32),
             jnp.asarray(rng.standard_normal((1, 4, 4, 32)), jnp.float32)]
    variables = head.init({'params': jax.random.PRNGKey(0),
                           'dropout': jax.random.PRNGKey(1)},
                          feats, train=False)
    cls_logits, mask_logits = head.apply(variables, feats, train=False)
    assert cls_logits.shape == (1, 8, 5)      # Q x (C + no-object)
    assert mask_logits.shape == (1, 8, 16, 16)

    label = jnp.asarray(rng.integers(0, 4, (1, 64, 64)), jnp.int32)
    losses = head.loss_by_feat((cls_logits, mask_logits), label)
    assert set(losses) == {'loss_cls', 'loss_mask', 'loss_dice'}
    for k, v in losses.items():
        assert np.isfinite(float(v)), k

    sem = head.predict_by_feat((cls_logits, mask_logits), size=(64, 64))
    assert sem.shape == (1, 64, 64, 4)
    assert np.isfinite(np.asarray(sem)).all()


def test_maskformer_in_encoder_decoder():
    model = MODELS.build(dict(
        type='EncoderDecoder',
        backbone=dict(type='ResNet', depth=18, base_channels=8,
                      stem_channels=8),
        decode_head=dict(type='MaskFormerHead', in_channels=[8, 16, 32, 64],
                         channels=16, feat_channels=16, num_queries=8,
                         num_transformer_decoder_layers=1, num_heads=2,
                         num_classes=5, in_index=[0, 1, 2, 3])))
    x = jnp.zeros((1, 64, 64, 3))
    labels = jnp.zeros((1, 64, 64), jnp.int32)
    variables = model.init({'params': jax.random.PRNGKey(0),
                            'dropout': jax.random.PRNGKey(1)},
                           x, labels, method='loss')
    losses, _ = model.apply(variables, x, labels, method='loss',
                            mutable=['batch_stats'],
                            rngs={'dropout': jax.random.PRNGKey(2)})
    assert 'decode.loss_cls' in losses
    logits = model.apply(variables, x, method='predict')
    assert logits.shape == (1, 64, 64, 5)
