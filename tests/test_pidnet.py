"""PIDNet family tests (reference test style: tiny tensors, both variants)."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lednet_tpu.config import Config
from lednet_tpu.registry import MODELS
import lednet_tpu.models  # noqa: F401

REF = '/root/reference'


@pytest.mark.parametrize('num_stem_blocks', [2, 3])
def test_pidnet_backbone_shapes(num_stem_blocks):
    model = MODELS.build(dict(type='PIDNet', channels=16, ppm_channels=24,
                              num_stem_blocks=num_stem_blocks,
                              num_branch_blocks=2))
    x = jnp.zeros((1, 64, 128, 3))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    p, out, d = model.apply(variables, x, train=False)
    assert p.shape == (1, 8, 16, 32)     # 2c @ 1/8
    assert out.shape == (1, 8, 16, 64)   # 4c @ 1/8
    assert d.shape == (1, 8, 16, 32)


@pytest.mark.skipif(not os.path.isdir(REF), reason='reference not mounted')
@pytest.mark.slow
def test_pidnet_from_reference_config_loss_and_predict():
    cfg = Config.fromfile(
        f'{REF}/configs/pidnet/pidnet-s_2xb6-120k_1024x1024-cityscapes.py')
    model_cfg = dict(cfg.model)
    # shrink for test speed but keep the architecture wiring
    model_cfg['backbone'] = dict(model_cfg['backbone'], channels=16,
                                 ppm_channels=24, num_branch_blocks=2)
    model_cfg['decode_head'] = dict(model_cfg['decode_head'], in_channels=64,
                                    channels=32)
    model = MODELS.build(model_cfg)
    x = jnp.zeros((1, 64, 64, 3))
    labels = dict(gt_seg_map=jnp.zeros((1, 64, 64), jnp.int32),
                  gt_edge_map=jnp.zeros((1, 64, 64), jnp.int32))
    variables = model.init({'params': jax.random.PRNGKey(0),
                            'dropout': jax.random.PRNGKey(1)},
                           x, labels, method='loss')
    losses, _ = model.apply(variables, x, labels, method='loss',
                            mutable=['batch_stats'],
                            rngs={'dropout': jax.random.PRNGKey(2)})
    assert {'decode.loss_sem_p', 'decode.loss_sem_i', 'decode.loss_bd',
            'decode.loss_sem_bd', 'decode.acc_seg'} == set(losses)
    for k, v in losses.items():
        assert np.isfinite(float(v)), k

    logits = model.apply(variables, x, method='predict')
    assert logits.shape == (1, 64, 64, 19)


def test_boundary_loss_matches_torch(rng):
    import torch
    import torch.nn.functional as F
    from lednet_tpu.models.losses import BoundaryLoss
    pred = rng.standard_normal((2, 16, 16, 1)).astype(np.float32)
    gt = rng.integers(0, 2, (2, 16, 16)).astype(np.int32)
    ours = float(BoundaryLoss()(jnp.asarray(pred), jnp.asarray(gt)))
    # reference formulation
    log_p = torch.from_numpy(pred.transpose(0, 3, 1, 2)).permute(
        0, 2, 3, 1).contiguous().view(1, -1)
    target_t = torch.from_numpy(gt).view(1, -1).float()
    pos = target_t == 1
    neg = target_t == 0
    weight = torch.zeros_like(log_p)
    pos_num, neg_num = pos.sum(), neg.sum()
    weight[pos] = neg_num * 1.0 / (pos_num + neg_num)
    weight[neg] = pos_num * 1.0 / (pos_num + neg_num)
    ref = float(F.binary_cross_entropy_with_logits(log_p, target_t, weight))
    np.testing.assert_allclose(ours, ref, rtol=1e-5)


def test_dice_and_focal_losses_finite(rng):
    from lednet_tpu.models.losses import DiceLoss, FocalLoss, LovaszLoss, TverskyLoss
    logits = jnp.asarray(rng.standard_normal((2, 8, 8, 4)).astype(np.float32))
    labels = jnp.asarray(rng.integers(0, 4, (2, 8, 8)).astype(np.int32))
    for loss in [DiceLoss(use_sigmoid=False), FocalLoss(),
                 TverskyLoss(), LovaszLoss()]:
        v = float(loss(logits, labels))
        assert np.isfinite(v) and v >= 0
