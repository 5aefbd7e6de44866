"""Tests for PointRend/PSA/SETR-MLA/DPT/Segmenter heads and ResNeXt/ResNeSt/
BEiT backbones."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lednet_tpu.registry import MODELS
import lednet_tpu.models  # noqa: F401

pytestmark = pytest.mark.slow  # whole-network transplant / long-run tier


def test_point_sample_matches_resize():
    from lednet_tpu.models.decode_heads.point_setr_heads import point_sample
    rng = np.random.default_rng(0)
    feat = jnp.asarray(rng.standard_normal((1, 8, 8, 3)), jnp.float32)
    # sampling at every pixel center reproduces the feature map
    ys, xs = jnp.meshgrid(jnp.arange(8), jnp.arange(8), indexing='ij')
    coords = jnp.stack([(xs.reshape(-1) + 0.5) / 8,
                        (ys.reshape(-1) + 0.5) / 8], -1)[None]
    out = point_sample(feat, coords)
    np.testing.assert_allclose(np.asarray(out.reshape(1, 8, 8, 3)),
                               np.asarray(feat), atol=1e-5)


def test_point_head_cascade():
    model = MODELS.build(dict(
        type='CascadeEncoderDecoder', num_stages=2,
        backbone=dict(type='ResNet', depth=18, base_channels=8,
                      stem_channels=8),
        decode_head=[
            dict(type='FCNHead', in_channels=64, in_index=-1, channels=16,
                 num_convs=1, concat_input=False, num_classes=5),
            dict(type='PointHead', in_channels=16, in_index=0, channels=16,
                 num_points=32, num_classes=5),
        ]))
    x = jnp.zeros((1, 64, 64, 3))
    labels = jnp.zeros((1, 64, 64), jnp.int32)
    variables = model.init({'params': jax.random.PRNGKey(0),
                            'dropout': jax.random.PRNGKey(1)},
                           x, labels, method='loss')
    losses, _ = model.apply(variables, x, labels, method='loss',
                            mutable=['batch_stats'],
                            rngs={'dropout': jax.random.PRNGKey(2)})
    assert 'decode_1.loss_point' in losses
    logits = model.apply(variables, x, method='predict')
    assert logits.shape == (1, 64, 64, 5)


def _run_head(cfg, feats):
    head = MODELS.build(cfg)
    variables = head.init({'params': jax.random.PRNGKey(0),
                           'dropout': jax.random.PRNGKey(1)},
                          feats, train=False)
    return head.apply(variables, feats, train=False)


def test_psa_setr_dpt_segmenter_heads():
    rng = np.random.default_rng(0)
    feats = [jnp.asarray(rng.standard_normal((1, 8, 8, 16)), jnp.float32)
             for _ in range(4)]
    out = _run_head(dict(type='PSAHead', in_channels=16, channels=16,
                         num_classes=3, in_index=0, mask_size=(8, 8)), feats)
    assert out.shape == (1, 8, 8, 3)
    out = _run_head(dict(type='SETRMLAHead', in_channels=[16] * 4,
                         channels=32, mla_channels=8, up_scale=2,
                         num_classes=3, in_index=[0, 1, 2, 3]), feats)
    assert out.shape == (1, 16, 16, 3)
    # DPT reassembles 8x8 token grids into a 32/16/8/4 pyramid and the
    # fusion blocks upsample x2 each, so logits land at 8x the grid
    # (reference dpt_head.py:47-67,205-211).
    out = _run_head(dict(type='DPTHead', in_channels=[16] * 4, channels=16,
                         num_classes=3, in_index=[0, 1, 2, 3],
                         post_process_channels=[8, 16, 24, 32]), feats)
    assert out.shape == (1, 64, 64, 3)
    out = _run_head(dict(type='SegmenterMaskTransformerHead', in_channels=16,
                         channels=16, embed_dims=16, num_heads=2,
                         num_classes=3, in_index=3), feats)
    assert out.shape == (1, 8, 8, 3)


def test_resnext_resnest_beit():
    x = jnp.zeros((1, 64, 64, 3))
    for cfg, ch in [
        (dict(type='ResNeXt', depth=50, base_channels=16, stem_channels=16), 64),
        (dict(type='ResNeSt', depth=50, base_channels=8, stem_channels=8), 32),
    ]:
        model = MODELS.build(cfg)
        variables = model.init(jax.random.PRNGKey(0), x, train=False)
        outs = model.apply(variables, x, train=False)
        assert outs[0].shape[-1] == ch

    beit = MODELS.build(dict(type='BEiT', embed_dims=16, num_layers=2,
                             num_heads=2, out_indices=(0, 1)))
    variables = beit.init(jax.random.PRNGKey(0), x, train=False)
    outs = beit.apply(variables, x, train=False)
    assert outs[0].shape == (1, 4, 4, 16)


def test_gated_stubs_raise():
    with pytest.raises(NotImplementedError):
        MODELS.build(dict(type='TIMMBackbone', model_name='resnet50'))
    with pytest.raises(NotImplementedError):
        MODELS.build(dict(type='VPD'))
