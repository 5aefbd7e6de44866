"""Tests for depth estimation, extra metrics, RSInferencer, Hausdorff loss."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

import lednet_tpu

lednet_tpu.register_all_modules()
from lednet_tpu.registry import MODELS


def test_depth_metric():
    from lednet_tpu.evaluation import DepthMetric
    m = DepthMetric()
    rng = np.random.default_rng(0)
    gt = rng.uniform(0.5, 10, (2, 16, 16))
    m.process(gt * 1.1, gt)
    res = m.compute_metrics()
    assert res['d1'] == 1.0            # 1.1x is within the 1.25 threshold
    assert abs(res['abs_rel'] - 0.1) < 1e-3


def test_cityscapes_metric_dump(tmp_path):
    from lednet_tpu.evaluation import CityscapesMetric
    m = CityscapesMetric(output_dir=str(tmp_path / 'preds'))
    pred = np.zeros((1, 8, 8), np.int32)
    pred[0, :4] = 13  # car trainId -> labelId 26
    m.process(pred, np.zeros((1, 8, 8), np.int32), 19)
    res = m.compute_metrics()
    assert 'mIoU' in res
    import cv2
    dumped = cv2.imread(str(tmp_path / 'preds' / 'pred_000000.png'),
                        cv2.IMREAD_UNCHANGED)
    assert set(np.unique(dumped)) == {7, 26}  # labelIds, not trainIds


def test_hausdorff_loss_finite(rng):
    from lednet_tpu.models.losses import HuasdorffDisstanceLoss
    logits = jnp.asarray(rng.standard_normal((1, 16, 16, 3)), jnp.float32)
    labels = jnp.asarray(rng.integers(0, 3, (1, 16, 16)), jnp.int32)
    v = float(HuasdorffDisstanceLoss()(logits, labels))
    assert np.isfinite(v) and v >= 0


@pytest.mark.slow
def test_depth_estimator_build_and_predict():
    model = MODELS.build(dict(
        type='DepthEstimator',
        backbone=dict(type='ResNet', depth=18, base_channels=8,
                      stem_channels=8),
        decode_head=dict(type='FCNHead', in_channels=64, in_index=-1,
                         channels=16, num_convs=1, concat_input=False,
                         num_classes=2, out_channels=1, threshold=0.5,
                         loss_decode=dict(type='SiLogLoss'))))
    x = jnp.zeros((1, 32, 32, 3))
    variables = model.init({'params': jax.random.PRNGKey(0),
                            'dropout': jax.random.PRNGKey(1)}, x, train=False)
    depth = model.apply(variables, x, method='predict')
    assert depth.shape == (1, 32, 32, 1)


@pytest.mark.slow
def test_rs_inferencer(tmp_path, rng):
    from lednet_tpu.apis import RSInferencer
    from lednet_tpu.config import Config
    from lednet_tpu.engine.runner import Runner
    cfg = Config(dict(model=dict(
        type='EncoderDecoder',
        backbone=dict(type='LEDNet', channels=8, ppm_channels=32),
        decode_head=dict(type='LEDHead', in_channels=32, channels=16,
                         dropout_ratio=0.0, num_classes=2),
        test_cfg=dict(mode='whole')), work_dir=str(tmp_path)))
    runner = Runner(cfg)
    runner.init_state()
    inf = RSInferencer(runner, batch_size=2)
    image = rng.integers(0, 255, (96, 128, 3), np.uint8)
    seg = inf.run(image, window_size=(64, 64), strides=(48, 48))
    assert seg.shape == (96, 128)
    assert set(np.unique(seg)) <= {0, 1}
