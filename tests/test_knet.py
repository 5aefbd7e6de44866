"""K-Net IterativeDecodeHead: stage outputs, gated kernel update semantics,
per-stage losses, end-to-end EncoderDecoder + config build."""
import os.path as osp

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lednet_tpu.config import Config
from lednet_tpu.registry import MODELS
import lednet_tpu.models  # noqa: F401

CFG_ROOT = osp.join(osp.dirname(__file__), '..', 'configs')


def _head(num_stages=2):
    return MODELS.build(dict(
        type='IterativeDecodeHead', in_channels=32, in_index=-1,
        channels=16, num_classes=5, num_stages=num_stages, num_convs=1,
        num_heads=2, feedforward_channels=32, num_mask_fcs=1))


def test_knet_stage_outputs_and_losses():
    head = _head(num_stages=2)
    rng = np.random.default_rng(0)
    feats = [jnp.asarray(rng.standard_normal((2, 8, 8, 32)), jnp.float32)]
    variables = head.init({'params': jax.random.PRNGKey(0),
                           'dropout': jax.random.PRNGKey(1)},
                          feats, train=False)

    # eval: final-stage logits only
    logits = head.apply(variables, feats, train=False)
    assert logits.shape == (2, 8, 8, 5)

    # train: num_stages + 1 supervised outputs (stage 0 = conv_seg masks)
    stages = head.apply(variables, feats, train=True,
                        rngs={'dropout': jax.random.PRNGKey(2)},
                        mutable=['batch_stats'])[0]
    assert isinstance(stages, tuple) and len(stages) == 3
    for s in stages:
        assert s.shape == (2, 8, 8, 5)
        assert np.isfinite(np.asarray(s)).all()

    label = jnp.asarray(rng.integers(0, 5, (2, 16, 16)), jnp.int32)
    losses = head.loss_by_feat(stages, label)
    assert {'s0.loss_ce', 's1.loss_ce', 's2.loss_ce'} <= set(losses)
    for k, v in losses.items():
        assert np.isfinite(float(v)), k

    pred = head.predict_by_feat(stages, size=(16, 16))
    assert pred.shape == (2, 16, 16, 5)


def test_knet_stage0_is_conv_seg_of_kernels():
    """Stage-0 masks must be exactly the 1x1 conv with the proposal
    kernels — the weight-sharing that defines K-Net's initialization."""
    head = MODELS.build(dict(
        type='IterativeDecodeHead', in_channels=32, in_index=-1,
        channels=16, num_classes=5, num_stages=1, num_convs=1,
        num_heads=2, feedforward_channels=32, dropout_ratio=0.0))
    rng = np.random.default_rng(1)
    feats = [jnp.asarray(rng.standard_normal((1, 8, 8, 32)), jnp.float32)]
    variables = head.init({'params': jax.random.PRNGKey(0),
                           'dropout': jax.random.PRNGKey(1)},
                          feats, train=False)
    stages = head.apply(variables, feats, train=True,
                        rngs={'dropout': jax.random.PRNGKey(2)},
                        mutable=['batch_stats'])[0]
    # refinement must actually change the masks
    assert not np.allclose(np.asarray(stages[0]), np.asarray(stages[1]))

    # recompute stage 0 by hand from params
    p = jax.device_get(variables['params'])
    w = np.asarray(p['seg_kernel'])[0, 0]          # (C, N)
    b = np.asarray(p['seg_bias'])
    # rebuild the FCN feature (1 ConvModule) by calling with num_stages=0
    head0 = MODELS.build(dict(
        type='IterativeDecodeHead', in_channels=32, in_index=-1,
        channels=16, num_classes=5, num_stages=0, num_convs=1,
        num_heads=2, feedforward_channels=32, dropout_ratio=0.0))
    sub = {'params': {k: v for k, v in variables['params'].items()
                      if not k.startswith('kernel_update_head')},
           'batch_stats': variables['batch_stats']}
    mask0 = head0.apply(sub, feats, train=True,
                        rngs={'dropout': jax.random.PRNGKey(2)},
                        mutable=['batch_stats'])[0][0]
    np.testing.assert_allclose(np.asarray(mask0), np.asarray(stages[0]),
                               atol=1e-6)
    assert w.shape == (16, 5) and b.shape == (5,)


@pytest.mark.slow
def test_knet_gradients_flow_to_all_stages():
    head = _head(num_stages=2)
    rng = np.random.default_rng(2)
    feats = [jnp.asarray(rng.standard_normal((1, 8, 8, 32)), jnp.float32)]
    label = jnp.asarray(rng.integers(0, 5, (1, 8, 8)), jnp.int32)
    variables = head.init({'params': jax.random.PRNGKey(0),
                           'dropout': jax.random.PRNGKey(1)},
                          feats, train=False)

    def loss_fn(params):
        stages = head.apply(
            {'params': params, 'batch_stats': variables['batch_stats']},
            feats, train=True, rngs={'dropout': jax.random.PRNGKey(2)},
            mutable=['batch_stats'])[0]
        losses = head.loss_by_feat(stages, label)
        return sum(v for k, v in losses.items() if 'loss' in k)

    grads = jax.grad(loss_fn)(variables['params'])
    flat = jax.tree_util.tree_leaves_with_path(grads)
    for path, g in flat:
        name = jax.tree_util.keystr(path)
        assert np.isfinite(np.asarray(g)).all(), name
    # the updator gates and every stage's attention must receive signal
    for key in ['seg_kernel', 'kernel_update_head0', 'kernel_update_head1']:
        sub = grads[key]
        total = sum(float(jnp.sum(jnp.abs(g)))
                    for g in jax.tree_util.tree_leaves(sub))
        assert total > 0, key


def test_knet_config_builds_and_runs():
    cfg = Config.fromfile(osp.join(
        CFG_ROOT, 'knet', 'knet_s3_fcn_r50-d8_cityscapes-512x1024.py'))
    assert cfg.model.decode_head.type == 'IterativeDecodeHead'
    mcfg = dict(cfg.model)
    # shrink for test speed
    mcfg['backbone'] = dict(type='ResNet', depth=18, base_channels=8,
                            stem_channels=8)
    mcfg['decode_head'].update(in_channels=64, channels=16, num_classes=5,
                               num_stages=1, feedforward_channels=32,
                               num_heads=2)
    mcfg.pop('auxiliary_head', None)
    model = MODELS.build(mcfg)
    x = jnp.zeros((1, 64, 64, 3))
    labels = jnp.zeros((1, 64, 64), jnp.int32)
    variables = model.init({'params': jax.random.PRNGKey(0),
                            'dropout': jax.random.PRNGKey(1)},
                           x, labels, method='loss')
    losses, _ = model.apply(variables, x, labels, method='loss',
                            mutable=['batch_stats'],
                            rngs={'dropout': jax.random.PRNGKey(2)})
    assert any(k.startswith('decode.s') for k in losses)
    logits = model.apply(variables, x, method='predict')
    assert logits.shape == (1, 64, 64, 5)
