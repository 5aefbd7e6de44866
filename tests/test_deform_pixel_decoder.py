"""MSDeformAttn pixel decoder: bilinear-sampling semantics and the
Mask2Former pixel_decoder='msdeform' path."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lednet_tpu.models.decode_heads.deform_pixel_decoder import (
    MSDeformAttnPixelDecoder, bilinear_sample)
from lednet_tpu.registry import MODELS
import lednet_tpu.models  # noqa: F401

pytestmark = pytest.mark.slow  # whole-network transplant / long-run tier


def test_bilinear_sample_matches_torch_grid_sample(rng):
    import torch
    import torch.nn.functional as F
    v = rng.standard_normal((2, 7, 9, 4)).astype(np.float32)
    pts = rng.uniform(-0.1, 1.1, (2, 25, 2)).astype(np.float32)  # incl. OOB
    got = bilinear_sample(jnp.asarray(v), jnp.asarray(pts))
    grid = torch.from_numpy(pts * 2 - 1).reshape(2, 25, 1, 2)
    ref = F.grid_sample(torch.from_numpy(v.transpose(0, 3, 1, 2)), grid,
                        mode='bilinear', padding_mode='zeros',
                        align_corners=False)
    ref = ref.squeeze(-1).permute(0, 2, 1).numpy()
    np.testing.assert_allclose(np.asarray(got), ref, atol=1e-5)


def test_pixel_decoder_shapes(rng):
    dec = MSDeformAttnPixelDecoder(feat_channels=32, num_encoder_layers=2,
                                   num_heads=4, num_points=2)
    xs = [jnp.asarray(rng.standard_normal((1, 16, 16, 8)), jnp.float32),
          jnp.asarray(rng.standard_normal((1, 8, 8, 16)), jnp.float32),
          jnp.asarray(rng.standard_normal((1, 4, 4, 24)), jnp.float32),
          jnp.asarray(rng.standard_normal((1, 2, 2, 32)), jnp.float32)]
    variables = dec.init(jax.random.PRNGKey(0), xs, train=False)
    mask_feat, memory = dec.apply(variables, xs, train=False)
    assert mask_feat.shape == (1, 16, 16, 32)
    assert memory.shape == (1, 2, 2, 32)
    assert np.isfinite(np.asarray(mask_feat)).all()


def test_mask2former_msdeform_path(rng):
    head = MODELS.build(dict(
        type='Mask2FormerHead', in_channels=[8, 16, 24, 32], channels=16,
        feat_channels=16, num_queries=8, num_transformer_decoder_layers=2,
        num_heads=2, num_classes=4, in_index=[0, 1, 2, 3],
        pixel_decoder='msdeform'))
    feats = [jnp.asarray(rng.standard_normal((1, 16, 16, 8)), jnp.float32),
             jnp.asarray(rng.standard_normal((1, 8, 8, 16)), jnp.float32),
             jnp.asarray(rng.standard_normal((1, 4, 4, 24)), jnp.float32),
             jnp.asarray(rng.standard_normal((1, 4, 4, 32)), jnp.float32)]
    variables = head.init({'params': jax.random.PRNGKey(0),
                           'dropout': jax.random.PRNGKey(1)},
                          feats, train=False)
    cls_logits, mask_logits = head.apply(variables, feats, train=False)
    assert cls_logits.shape == (1, 8, 5)
    assert mask_logits.shape == (1, 8, 16, 16)
    label = jnp.asarray(rng.integers(0, 4, (1, 32, 32)), jnp.int32)
    losses = head.loss_by_feat((cls_logits, mask_logits), label)
    for k, v in losses.items():
        assert np.isfinite(float(v)), k
