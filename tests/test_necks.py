"""Neck parity wave 2 (reference ``mmseg/models/necks/``): JPU,
MultiLevelNeck, MLANeck, Feature2Pyramid — shape contracts and the
reference's output conventions."""
import jax
import jax.numpy as jnp
import numpy as np

from lednet_tpu.registry import MODELS
import lednet_tpu.models  # noqa: F401


def _feats(rng, chans, base=16):
    return [jnp.asarray(rng.standard_normal(
        (1, base // (2 ** i), base // (2 ** i), c)).astype(np.float32))
        for i, c in enumerate(chans)]


def _run(neck, feats):
    v = neck.init(jax.random.PRNGKey(0), feats, train=False)
    return neck.apply(v, feats, train=False)


def test_jpu_outputs(rng):
    neck = MODELS.build(dict(type='JPU', in_channels=(8, 16, 32),
                             mid_channels=8))
    feats = _feats(rng, (8, 16, 32))
    outs = _run(neck, feats)
    # lower levels pass through untouched; last = concat of 4 dilated branches
    assert len(outs) == 3
    np.testing.assert_array_equal(np.asarray(outs[0]), np.asarray(feats[0]))
    np.testing.assert_array_equal(np.asarray(outs[1]), np.asarray(feats[1]))
    assert outs[2].shape == (1, 16, 16, 8 * 4)  # at the largest map's size


def test_multilevel_neck_scales(rng):
    neck = MODELS.build(dict(type='MultiLevelNeck', in_channels=[8],
                             out_channels=8, scales=[0.5, 1, 2, 4]))
    feats = _feats(rng, (8,))
    outs = _run(neck, feats)
    assert [o.shape[1] for o in outs] == [8, 16, 32, 64]
    assert all(o.shape[-1] == 8 for o in outs)


def test_mla_neck_accumulation(rng):
    neck = MODELS.build(dict(type='MLANeck', in_channels=[8, 8, 8, 8],
                             out_channels=4))
    feats = [jnp.asarray(rng.standard_normal((1, 8, 8, 8)), jnp.float32)
             for _ in range(4)]
    outs = _run(neck, feats)
    assert len(outs) == 4
    assert all(o.shape == (1, 8, 8, 4) for o in outs)


def test_feature2pyramid_rescales(rng):
    neck = MODELS.build(dict(type='Feature2Pyramid', embed_dim=8,
                             rescales=[4, 2, 1, 0.5],
                             norm_cfg=dict(type='BN')))
    feats = [jnp.asarray(rng.standard_normal((1, 8, 8, 8)), jnp.float32)
             for _ in range(4)]
    outs = _run(neck, feats)
    assert [o.shape[1] for o in outs] == [32, 16, 8, 4]
    # identity level passes through untouched
    np.testing.assert_array_equal(np.asarray(outs[2]), np.asarray(feats[2]))


def test_fastfcn_style_segmentor_with_jpu():
    model = MODELS.build(dict(
        type='EncoderDecoder',
        backbone=dict(type='ResNet', depth=18, base_channels=8,
                      stem_channels=8, out_indices=(1, 2, 3)),
        neck=dict(type='JPU', in_channels=(16, 32, 64), mid_channels=8),
        decode_head=dict(type='FCNHead', in_channels=32, in_index=-1,
                         channels=16, num_convs=1, concat_input=False,
                         num_classes=5),
        test_cfg=dict(mode='whole')))
    x = jnp.zeros((1, 64, 64, 3))
    v = model.init({'params': jax.random.PRNGKey(0),
                    'dropout': jax.random.PRNGKey(1)}, x, train=False)
    pred = model.apply(v, x, method='predict')
    assert pred.shape == (1, 64, 64, 5)
