"""Shape tests for the wider model zoo (ResNet, BiSeNetV1/V2, STDC)."""
import jax
import jax.numpy as jnp
import pytest

from lednet_tpu.registry import MODELS
import lednet_tpu.models  # noqa: F401


def _run(model, x):
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    return model.apply(variables, x, train=False)


def test_resnet18_shapes():
    model = MODELS.build(dict(type='ResNet', depth=18, base_channels=16,
                              stem_channels=16))
    outs = _run(model, jnp.zeros((1, 64, 64, 3)))
    assert [o.shape for o in outs] == [(1, 16, 16, 16), (1, 8, 8, 32),
                                       (1, 4, 4, 64), (1, 2, 2, 128)]


def test_resnet50_d8_dilated_shapes():
    model = MODELS.build(dict(type='ResNetV1c', depth=50, base_channels=8,
                              stem_channels=8, strides=(1, 2, 1, 1),
                              dilations=(1, 1, 2, 4), contract_dilation=True))
    outs = _run(model, jnp.zeros((1, 64, 64, 3)))
    # d8: stages 3/4 keep 1/8 resolution
    assert outs[1].shape[1:3] == (8, 8)
    assert outs[2].shape[1:3] == (8, 8)
    assert outs[3].shape[1:3] == (8, 8)
    assert outs[3].shape[-1] == 8 * 8 * 4  # base*8*expansion


def test_bisenetv1_shapes():
    model = MODELS.build(dict(
        type='BiSeNetV1',
        backbone_cfg=dict(type='ResNet', depth=18, base_channels=16,
                          stem_channels=16),
        spatial_channels=(16, 16, 16, 32),
        context_channels=(32, 64, 128),
        out_channels=64))
    outs = _run(model, jnp.zeros((1, 64, 64, 3)))
    assert outs[0].shape == (1, 8, 8, 64)     # fused 1/8
    assert outs[1].shape == (1, 8, 8, 32)     # ctx 1/8
    assert outs[2].shape == (1, 4, 4, 32)     # ctx 1/16


def test_bisenetv2_shapes():
    model = MODELS.build(dict(type='BiSeNetV2', detail_channels=(16, 16, 32),
                              semantic_channels=(4, 8, 16, 32),
                              bga_channels=32))
    outs = _run(model, jnp.zeros((1, 64, 64, 3)))
    assert outs[0].shape == (1, 8, 8, 32)     # BGA out 1/8
    assert outs[1].shape == (1, 16, 16, 4)    # stem 1/4
    assert outs[4].shape == (1, 2, 2, 32)     # stage4 1/32


def test_stdc_context_path_shapes():
    model = MODELS.build(dict(
        type='STDCContextPathNet',
        backbone_cfg=dict(type='STDCNet', stdc_type='STDCNet1',
                          channels=(8, 16, 32, 64, 128),
                          bottleneck_type='cat', norm_cfg=dict(type='BN'),
                          act_cfg=dict(type='ReLU')),
        last_in_channels=(128, 64),
        out_channels=32,
        ffm_cfg=dict(in_channels=64, out_channels=64, scale_factor=4)))
    outs = _run(model, jnp.zeros((1, 64, 64, 3)))
    assert outs[0].shape == (1, 8, 8, 32)     # 1/8 backbone tap for STDCHead
    assert outs[1].shape == (1, 4, 4, 32)     # arm16 up
    assert outs[2].shape == (1, 8, 8, 32)     # arm8 up
    assert outs[3].shape == (1, 8, 8, 64)     # fused


def test_stdc_head_boundary_loss():
    import numpy as np
    head = MODELS.build(dict(
        type='STDCHead', in_channels=32, channels=16, num_convs=1,
        num_classes=2, boundary_threshold=0.1, in_index=0,
        concat_input=False,
        loss_decode=[
            dict(type='CrossEntropyLoss', loss_name='loss_ce',
                 use_sigmoid=True, loss_weight=1.0),
            dict(type='DiceLoss', loss_name='loss_dice', loss_weight=1.0)]))
    x = [jnp.zeros((1, 8, 8, 32))]
    variables = head.init({'params': jax.random.PRNGKey(0),
                           'dropout': jax.random.PRNGKey(1)}, x, train=False)
    logits = head.apply(variables, x, train=False)
    label = jnp.asarray((np.indices((1, 32, 32)).sum(0) % 2).astype(np.int32))
    losses = head.loss_by_feat(logits, label)
    assert 'loss_ce' in losses and 'loss_dice' in losses
    assert all(jnp.isfinite(v) for v in losses.values())
