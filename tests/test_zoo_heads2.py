"""Tests for the third zoo wave: ViT/Swin/UNet backbones, UPer/OCR/SepFCN/
LRASPP/NL heads, and the Swin+UPer / OCR-cascade pairings."""
import jax
import jax.numpy as jnp
import numpy as np

from lednet_tpu.registry import MODELS
import lednet_tpu.models  # noqa: F401


def _run(model, *args, method=None):
    variables = model.init({'params': jax.random.PRNGKey(0),
                            'dropout': jax.random.PRNGKey(1)}, *args,
                           train=False)
    return model.apply(variables, *args, train=False)


def test_vit_shapes():
    model = MODELS.build(dict(type='VisionTransformer', img_size=32,
                              patch_size=8, embed_dims=16, num_layers=2,
                              num_heads=2, out_indices=(0, 1)))
    outs = _run(model, jnp.zeros((1, 64, 64, 3)))
    assert len(outs) == 2
    assert outs[0].shape == (1, 8, 8, 16)


def test_swin_uper():
    backbone = MODELS.build(dict(type='SwinTransformer', embed_dims=8,
                                 depths=(1, 1, 2, 1), num_heads=(1, 2, 4, 8),
                                 window_size=4))
    x = jnp.zeros((1, 64, 64, 3))
    v = backbone.init(jax.random.PRNGKey(0), x, train=False)
    outs = backbone.apply(v, x, train=False)
    assert [o.shape[-1] for o in outs] == [8, 16, 32, 64]
    assert outs[0].shape[1:3] == (16, 16)

    head = MODELS.build(dict(type='UPerHead', in_channels=[8, 16, 32, 64],
                             channels=16, num_classes=11,
                             in_index=[0, 1, 2, 3]))
    logits = _run(head, list(outs))
    assert logits.shape == (1, 16, 16, 11)


def test_unet_shapes():
    model = MODELS.build(dict(type='UNet', base_channels=4, num_stages=4,
                              enc_num_convs=(2, 2, 2, 2),
                              dec_num_convs=(2, 2, 2),
                              downsamples=(True, True, True),
                              enc_dilations=(1, 1, 1, 1),
                              dec_dilations=(1, 1, 1)))
    outs = _run(model, jnp.zeros((1, 32, 32, 3)))
    assert outs[0].shape == (1, 4, 4, 32)    # deepest
    assert outs[-1].shape == (1, 32, 32, 4)  # finest


def test_ocr_cascade_segmentor():
    model = MODELS.build(dict(
        type='CascadeEncoderDecoder',
        num_stages=2,
        backbone=dict(type='ResNet', depth=18, base_channels=8,
                      stem_channels=8),
        decode_head=[
            dict(type='FCNHead', in_channels=64, in_index=-1, channels=16,
                 num_convs=1, concat_input=False, num_classes=5),
            dict(type='OCRHead', in_channels=64, in_index=-1, channels=16,
                 ocr_channels=8, num_classes=5),
        ]))
    x = jnp.zeros((1, 64, 64, 3))
    labels = jnp.zeros((1, 64, 64), jnp.int32)
    variables = model.init({'params': jax.random.PRNGKey(0),
                            'dropout': jax.random.PRNGKey(1)},
                           x, labels, method='loss')
    losses, _ = model.apply(variables, x, labels, method='loss',
                            mutable=['batch_stats'],
                            rngs={'dropout': jax.random.PRNGKey(2)})
    assert any(k.startswith('decode_0') for k in losses)
    assert any(k.startswith('decode_1') for k in losses)
    logits = model.apply(variables, x, method='predict')
    assert logits.shape == (1, 64, 64, 5)


def test_sep_fcn_and_lraspp_and_nl():
    feats = [jnp.ones((1, 16, 16, 8)), jnp.ones((1, 8, 8, 16)),
             jnp.ones((1, 4, 4, 32))]
    sep = MODELS.build(dict(type='DepthwiseSeparableFCNHead', in_channels=32,
                            channels=16, num_classes=3, in_index=2,
                            concat_input=False))
    assert _run(sep, feats).shape == (1, 4, 4, 3)

    lraspp = MODELS.build(dict(type='LRASPPHead', in_channels=(8, 16, 32),
                               channels=16, branch_channels=(4, 8),
                               num_classes=3, in_index=(0, 1, 2)))
    out = _run(lraspp, feats)
    assert out.shape == (1, 16, 16, 3)

    nl = MODELS.build(dict(type='NLHead', in_channels=32, channels=16,
                           num_classes=3, in_index=2))
    assert _run(nl, feats).shape == (1, 4, 4, 3)
