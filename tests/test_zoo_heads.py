"""Shape/finite tests for the transformer-era zoo (MiT/SegFormer,
MSCAN/SegNeXt, PSP/ASPP/DeepLabV3+ heads)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lednet_tpu.registry import MODELS
import lednet_tpu.models  # noqa: F401


def _run_head(head, feats, label_classes=None):
    variables = head.init({'params': jax.random.PRNGKey(0),
                           'dropout': jax.random.PRNGKey(1)},
                          feats, train=False)
    logits = head.apply(variables, feats, train=False)
    assert np.isfinite(np.asarray(logits)).all()
    if label_classes:
        label = jnp.zeros((1,) + logits.shape[1:3], jnp.int32)
        losses = head.loss_by_feat(logits, label)
        assert np.isfinite(float(losses[next(iter(losses))]))
    return logits


def test_psp_head():
    head = MODELS.build(dict(type='PSPHead', in_channels=32, channels=16,
                             num_classes=5, in_index=0))
    logits = _run_head(head, [jnp.ones((1, 8, 8, 32))], label_classes=5)
    assert logits.shape == (1, 8, 8, 5)


def test_sep_aspp_head_with_c1():
    head = MODELS.build(dict(type='DepthwiseSeparableASPPHead',
                             in_channels=64, channels=32, num_classes=3,
                             dilations=(1, 6, 12, 18), c1_in_channels=16,
                             c1_channels=8, in_index=-1))
    feats = [jnp.ones((1, 16, 16, 16)), jnp.ones((1, 8, 8, 32)),
             jnp.ones((1, 4, 4, 48)), jnp.ones((1, 4, 4, 64))]
    logits = _run_head(head, feats)
    assert logits.shape == (1, 16, 16, 3)  # fused at c1 resolution


def test_mit_segformer():
    backbone = MODELS.build(dict(type='MixVisionTransformer', embed_dims=8,
                                 num_layers=(1, 1, 1, 1)))
    x = jnp.zeros((1, 64, 64, 3))
    variables = backbone.init(jax.random.PRNGKey(0), x, train=False)
    outs = backbone.apply(variables, x, train=False)
    assert [o.shape for o in outs] == [(1, 16, 16, 8), (1, 8, 8, 16),
                                       (1, 4, 4, 32), (1, 2, 2, 64)]
    head = MODELS.build(dict(type='SegformerHead',
                             in_channels=[8, 16, 32, 64], channels=16,
                             num_classes=19, in_index=[0, 1, 2, 3]))
    logits = _run_head(head, list(outs))
    assert logits.shape == (1, 16, 16, 19)


def test_mscan_segnext():
    backbone = MODELS.build(dict(type='MSCAN', embed_dims=(8, 16, 24, 32),
                                 depths=(1, 1, 1, 1),
                                 mlp_ratios=(2, 2, 2, 2)))
    x = jnp.zeros((1, 64, 64, 3))
    variables = backbone.init(jax.random.PRNGKey(0), x, train=False)
    outs = backbone.apply(variables, x, train=False)
    assert [o.shape[-1] for o in outs] == [8, 16, 24, 32]
    head = MODELS.build(dict(type='LightHamHead',
                             in_channels=[16, 24, 32], channels=16,
                             ham_channels=32, num_classes=7,
                             in_index=[1, 2, 3]))
    logits = _run_head(head, list(outs))
    assert logits.shape == (1, 8, 8, 7)
