"""Shape-level model tests (the reference's test style, SURVEY.md §4) plus
the end-to-end build-from-reference-config check."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lednet_tpu.config import Config
from lednet_tpu.registry import MODELS
import lednet_tpu.models  # noqa: F401  (registration)

REF = '/root/reference'


@pytest.mark.slow
def test_lednet_backbone_shapes():
    model = MODELS.build(dict(type='LEDNet', in_channels=3, channels=32,
                              ppm_channels=128, align_corners=False))
    x = jnp.zeros((1, 64, 128, 3))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    c3, c5, x1, x2 = model.apply(variables, x, train=False)
    assert c3.shape == (1, 8, 16, 64)    # 2c @ 1/8
    assert c5.shape == (1, 8, 16, 128)   # 4c @ 1/8
    assert x1.shape == (1, 32, 64, 32)   # c @ 1/2
    assert x2.shape == (1, 16, 32, 32)   # c @ 1/4


def test_lednet_param_count_near_reference():
    """Supplementary PDF Table 8 reports 1.661 M params for the full model;
    the withheld backbone reconstruction should land in the same regime."""
    model = MODELS.build(dict(type='LEDNet', channels=32, ppm_channels=128))
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)),
                           train=False)
    n = sum(np.prod(p.shape) for p in jax.tree.leaves(variables['params']))
    assert 0.8e6 < n < 3.5e6, f'param count {n} far from 1.66M target'


def test_ddrnet_backbone_shapes():
    model = MODELS.build(dict(type='DDRNet', in_channels=3, channels=32,
                              ppm_channels=128))
    x = jnp.zeros((1, 64, 128, 3))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    temp, out = model.apply(variables, x, train=False)
    assert temp.shape == (1, 8, 16, 64)
    assert out.shape == (1, 8, 16, 128)


@pytest.mark.skipif(not os.path.isdir(REF), reason='reference not mounted')
def test_encoder_decoder_from_reference_config():
    cfg = Config.fromfile(
        f'{REF}/configs/LED_Net/LEDNet_80k_cityscapes-1024x1024.py')
    model = MODELS.build(cfg.model.to_dict() if hasattr(cfg.model, 'to_dict')
                         else dict(cfg.model))
    x = jnp.zeros((1, 64, 128, 3))
    label = jnp.zeros((1, 64, 128), jnp.int32)
    variables = model.init({'params': jax.random.PRNGKey(0),
                            'dropout': jax.random.PRNGKey(1)}, x, train=False)

    # loss mode
    losses, _ = model.apply(variables, x, label, method='loss',
                            mutable=['batch_stats'],
                            rngs={'dropout': jax.random.PRNGKey(2)})
    assert set(losses) == {'decode.loss_context', 'decode.loss_spatial',
                           'decode.acc_seg'}
    assert np.isfinite(float(losses['decode.loss_context']))

    # predict mode: full-res 2-class logits
    logits = model.apply(variables, x, method='predict')
    assert logits.shape == (1, 64, 128, 2)


@pytest.mark.slow
def test_encoder_decoder_slide_inference():
    model = MODELS.build(dict(
        type='EncoderDecoder',
        backbone=dict(type='LEDNet', channels=32, ppm_channels=128),
        decode_head=dict(type='LEDHead', in_channels=128, channels=64,
                         dropout_ratio=0., num_classes=2),
        test_cfg=dict(mode='slide', crop_size=(64, 64), stride=(48, 48))))
    x = jnp.zeros((1, 96, 128, 3))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    logits = model.apply(variables, x, method='predict_slide')
    assert logits.shape == (1, 96, 128, 2)
    assert np.isfinite(np.asarray(logits)).all()


def test_ohem_loss_matches_torch():
    """OHEM static-shape formulation vs the reference algorithm in numpy."""
    rng = np.random.default_rng(0)
    from lednet_tpu.models.losses import OhemCrossEntropy
    logits = rng.standard_normal((2, 16, 16, 4)).astype(np.float32)
    labels = rng.integers(0, 4, (2, 16, 16)).astype(np.int32)
    labels[0, :4] = 255  # some ignored
    for min_kept, thres in [(10, 0.7), (100, 0.9), (100000, 0.5)]:
        loss = OhemCrossEntropy(thres=thres, min_kept=min_kept)
        ours = float(loss(jnp.asarray(logits), jnp.asarray(labels)))
        ref = _ohem_reference(logits, labels, thres, min_kept)
        np.testing.assert_allclose(ours, ref, rtol=1e-5)


def _ohem_reference(logits, labels, thres, min_kept):
    import torch
    import torch.nn.functional as F
    score = torch.from_numpy(logits.transpose(0, 3, 1, 2))
    target = torch.from_numpy(labels.astype(np.int64))
    pred = F.softmax(score, dim=1)
    pixel_losses = F.cross_entropy(score, target, ignore_index=255,
                                   reduction='none').view(-1)
    mask = target.view(-1) != 255
    tmp = target.clone()
    tmp[tmp == 255] = 0
    pred = pred.gather(1, tmp.unsqueeze(1))
    pred, ind = pred.view(-1)[mask].sort()
    min_value = pred[min(min_kept, pred.numel() - 1)]
    threshold = max(min_value, thres)
    pixel_losses = pixel_losses[mask][ind]
    pixel_losses = pixel_losses[pred < threshold]
    return float(pixel_losses.mean())


def test_sesp_fused_branches_equality(rng):
    """The fused-branch experiment must stay numerically identical to the
    reference-shaped per-branch path (same params)."""
    from lednet_tpu.models.espnet import SESP
    x = jnp.asarray(rng.standard_normal((1, 16, 24, 32)), np.float32)
    for spatial, stride in [(True, 1), (False, 1), (False, 2)]:
        fused = SESP(32, 32, stride=stride, spatial=spatial,
                     fuse_branches=True)
        plain = SESP(32, 32, stride=stride, spatial=spatial,
                     fuse_branches=False)
        variables = plain.init(jax.random.PRNGKey(0), x, train=False)
        a = fused.apply(variables, x, train=False)
        b = plain.apply(variables, x, train=False)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_kth_smallest_bisection_matches_sort():
    """_kth_smallest must equal jnp.sort()[k] bit-for-bit, including ties
    and the +2.0 ignore sentinels OHEM injects."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from lednet_tpu.models.losses.cross_entropy import _kth_smallest
    rng = np.random.default_rng(3)
    fn = jax.jit(_kth_smallest)
    for _ in range(5):
        n = 20000
        p = rng.uniform(0, 1, n).astype(np.float32)
        p[rng.integers(0, n, 500)] = 0.25          # heavy ties
        p[rng.integers(0, n, 200)] = 2.0           # sentinels
        k = int(rng.integers(0, n))
        want = float(np.sort(p)[k])
        got = float(fn(jnp.asarray(p), jnp.int32(k)))
        assert got == want
