"""Eval-shape bucketing + multi-chip eval (VERDICT #6, SURVEY §7.4.6).

Arbitrary val-image sizes must compile O(#buckets) jitted programs, not one
per distinct shape; and whole-mode val on a multi-device mesh (spatial
sharding) must match single-device results.
"""
import os

import cv2
import numpy as np
import pytest

import jax

import lednet_tpu
from lednet_tpu.config import Config
from lednet_tpu.engine.runner import Runner

pytestmark = pytest.mark.slow  # whole-network transplant / long-run tier

lednet_tpu.register_all_modules()


def _make_dataset(root, sizes, classes=2):
    img_dir = os.path.join(root, 'img')
    ann_dir = os.path.join(root, 'ann')
    os.makedirs(img_dir), os.makedirs(ann_dir)
    rng = np.random.default_rng(0)
    for i, (h, w) in enumerate(sizes):
        cv2.imwrite(f'{img_dir}/{i:02d}.png',
                    rng.integers(0, 255, (h, w, 3), np.uint8))
        cv2.imwrite(f'{ann_dir}/{i:02d}.png',
                    rng.integers(0, classes, (h, w), np.uint8))


def _cfg(root, work_dir, **extra):
    return Config(dict(
        model=dict(
            type='EncoderDecoder',
            data_preprocessor=dict(type='SegDataPreProcessor',
                                   mean=[0.0] * 3, std=[255.0] * 3),
            backbone=dict(type='LEDNet', channels=8, ppm_channels=32),
            decode_head=dict(type='LEDHead', in_channels=32, channels=16,
                             dropout_ratio=0.0, num_classes=2),
            test_cfg=dict(mode='whole')),
        val_dataloader=dict(
            batch_size=1,
            dataset=dict(type='BaseSegDataset',
                         data_root=root,
                         data_prefix=dict(img_path='img', seg_map_path='ann'),
                         img_suffix='.png', seg_map_suffix='.png',
                         metainfo=dict(classes=('bg', 'fg'),
                                       palette=[[0, 0, 0], [255, 0, 0]]),
                         pipeline=[dict(type='LoadImageFromFile'),
                                   dict(type='LoadAnnotations'),
                                   dict(type='PackSegInputs')])),
        val_evaluator=dict(type='IoUMetric'),
        work_dir=work_dir, **extra))


def test_three_odd_sizes_compile_at_most_two_programs(tmp_path):
    """97x130, 101x141 (same 128-bucket) and 140x141 (one bucket up in H):
    the cached jitted eval step must hold <= 2 compiled programs."""
    root = str(tmp_path / 'data')
    _make_dataset(root, [(97, 130), (101, 141), (140, 141)])
    runner = Runner(_cfg(root, str(tmp_path / 'wd')))
    runner.init_state()
    runner.val()
    step = runner._eval_steps['whole']
    assert step._cache_size() <= 2, step._cache_size()
    # second val() call reuses the same cache (no rebuild per call)
    runner.val()
    assert runner._eval_steps['whole'] is step
    assert step._cache_size() <= 2


@pytest.mark.skipif(len(jax.devices()) < 2, reason='needs a multi-dev mesh')
def test_batched_dp_val_matches_per_image(tmp_path):
    """Shape-grouped batched val (val_batch_size=8, batch axis sharded over
    the 8-device data mesh) must reproduce per-image (val_batch_size=1)
    metrics exactly — 10 same-sized images + 2 odd sizes exercising full
    chunks, a padded partial chunk, and singleton buckets."""
    root = str(tmp_path / 'data')
    _make_dataset(root, [(96, 96)] * 10 + [(97, 130), (120, 96)])
    r1 = Runner(_cfg(root, str(tmp_path / 'wd1'), val_batch_size=1))
    r1.init_state()
    base = r1.val()

    r2 = Runner(_cfg(root, str(tmp_path / 'wd2'), val_batch_size=8))
    r2.state = r1.state  # identical weights
    batched = r2.val()
    assert base == batched


@pytest.mark.skipif(len(jax.devices()) < 2, reason='needs a multi-dev mesh')
def test_spatial_sharded_val_matches_single_device(tmp_path):
    """val_spatial_shard=True on the 8-device CPU mesh reproduces the
    single-device metrics exactly (GSPMD halo exchange == unsharded conv)."""
    root = str(tmp_path / 'data')
    _make_dataset(root, [(97, 130), (120, 140)])
    r1 = Runner(_cfg(root, str(tmp_path / 'wd1')))
    r1.init_state()
    base = r1.val()

    r2 = Runner(_cfg(root, str(tmp_path / 'wd2'), val_spatial_shard=True))
    r2.state = r1.state  # identical weights
    sharded = r2.val()
    assert base == sharded
