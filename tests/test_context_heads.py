"""Shape/finite tests for the context-aggregation head zoo."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lednet_tpu.registry import MODELS
import lednet_tpu.models  # noqa: F401

pytestmark = pytest.mark.slow  # whole-network transplant / long-run tier

FEATS = None


def _feats():
    global FEATS
    if FEATS is None:
        rng = np.random.default_rng(0)
        FEATS = [jnp.asarray(rng.standard_normal((1, 16, 16, 8)), jnp.float32),
                 jnp.asarray(rng.standard_normal((1, 8, 8, 16)), jnp.float32),
                 jnp.asarray(rng.standard_normal((1, 8, 8, 32)), jnp.float32),
                 jnp.asarray(rng.standard_normal((1, 8, 8, 32)), jnp.float32)]
    return FEATS


@pytest.mark.parametrize('cfg,out_hw', [
    (dict(type='GCHead', in_channels=32, channels=16, num_classes=4,
          in_index=3), (8, 8)),
    (dict(type='DNLHead', in_channels=32, channels=16, num_classes=4,
          in_index=3), (8, 8)),
    (dict(type='EMAHead', in_channels=32, channels=16, ema_channels=16,
          num_bases=8, num_classes=4, in_index=3), (8, 8)),
    (dict(type='ISAHead', in_channels=32, channels=16, isa_channels=16,
          down_factor=(4, 4), num_classes=4, in_index=3), (8, 8)),
    (dict(type='APCHead', in_channels=32, channels=16, num_classes=4,
          pool_scales=(1, 2, 3), in_index=3), (8, 8)),
    (dict(type='DMHead', in_channels=32, channels=16, num_classes=4,
          filter_sizes=(1, 3), in_index=3), (8, 8)),
    (dict(type='ANNHead', in_channels=[16, 32], project_channels=16,
          channels=16, num_classes=4, in_index=(1, 2)), (8, 8)),
    (dict(type='SETRUPHead', in_channels=32, channels=16, num_classes=4,
          num_convs=1, up_scale=2, in_index=3), (16, 16)),
    (dict(type='EncHead', in_channels=[8, 16, 32, 32], channels=16,
          num_codes=8, num_classes=4, in_index=(0, 1, 2, 3)), (8, 8)),
])
def test_context_head(cfg, out_hw):
    head = MODELS.build(cfg)
    feats = _feats()
    variables = head.init({'params': jax.random.PRNGKey(0),
                           'dropout': jax.random.PRNGKey(1)},
                          feats, train=False)
    logits = head.apply(variables, feats, train=False)
    main = logits[0] if isinstance(logits, tuple) else logits
    assert main.shape == (1, *out_hw, 4)
    assert np.isfinite(np.asarray(main)).all()
    # loss path
    label = jnp.zeros((1, 16, 16), jnp.int32)
    losses = head.loss_by_feat(logits, label)
    for k, v in losses.items():
        assert np.isfinite(float(v)), k


def test_da_head():
    head = MODELS.build(dict(type='DAHead', in_channels=32, channels=16,
                             pam_channels=8, num_classes=4, in_index=3))
    feats = _feats()
    variables = head.init({'params': jax.random.PRNGKey(0),
                           'dropout': jax.random.PRNGKey(1)},
                          feats, train=False)
    logits = head.apply(variables, feats, train=False)
    assert isinstance(logits, tuple) and len(logits) == 3
    assert logits[0].shape == (1, 8, 8, 4)
    losses = head.loss_by_feat(logits, jnp.zeros((1, 16, 16), jnp.int32))
    assert any(k.startswith('pam_') for k in losses)
    assert any(k.startswith('cam_') for k in losses)


def test_cc_head():
    head = MODELS.build(dict(type='CCHead', in_channels=32, channels=16,
                             recurrence=2, num_classes=4, in_index=3))
    feats = _feats()
    variables = head.init({'params': jax.random.PRNGKey(0),
                           'dropout': jax.random.PRNGKey(1)},
                          feats, train=False)
    logits = head.apply(variables, feats, train=False)
    assert logits.shape == (1, 8, 8, 4)
    assert np.isfinite(np.asarray(logits)).all()
