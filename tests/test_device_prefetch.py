"""Device-prefetch input staging (loader.prefetch_to_device).

The background H2D thread must not change training semantics: the same
config trained with device_prefetch=0 (synchronous copies) and =2
(overlapped) from the same seed must produce identical final weights.
"""
import pytest
import os

import cv2
import numpy as np

import jax

import lednet_tpu
from lednet_tpu.config import Config
from lednet_tpu.engine.runner import Runner

lednet_tpu.register_all_modules()


def _make_dataset(root, n=8, size=64):
    img_dir = os.path.join(root, 'img')
    ann_dir = os.path.join(root, 'ann')
    os.makedirs(img_dir), os.makedirs(ann_dir)
    rng = np.random.default_rng(0)
    for i in range(n):
        cv2.imwrite(f'{img_dir}/{i:02d}.png',
                    rng.integers(0, 255, (size, size, 3), np.uint8))
        cv2.imwrite(f'{ann_dir}/{i:02d}.png',
                    rng.integers(0, 2, (size, size), np.uint8))


def _cfg(root, work_dir, prefetch):
    return Config(dict(
        model=dict(
            type='EncoderDecoder',
            data_preprocessor=dict(type='SegDataPreProcessor',
                                   mean=[0.0] * 3, std=[255.0] * 3),
            backbone=dict(type='DDRNet', channels=8, ppm_channels=16),
            decode_head=dict(type='DDRHead', in_channels=32, channels=16,
                             dropout_ratio=0.0, num_classes=2)),
        train_dataloader=dict(
            batch_size=2,
            sampler=dict(type='InfiniteSampler', shuffle=True),
            dataset=dict(type='BaseSegDataset', data_root=root,
                         data_prefix=dict(img_path='img', seg_map_path='ann'),
                         img_suffix='.png', seg_map_suffix='.png',
                         metainfo=dict(classes=('bg', 'fg')),
                         pipeline=[dict(type='LoadImageFromFile'),
                                   dict(type='LoadAnnotations'),
                                   dict(type='PackSegInputs')])),
        optim_wrapper=dict(optimizer=dict(type='SGD', lr=0.01, momentum=0.9,
                                          weight_decay=5e-4)),
        param_scheduler=[dict(type='PolyLR', power=0.9, begin=0, end=6,
                              by_epoch=False)],
        train_cfg=dict(type='IterBasedTrainLoop', max_iters=6),
        default_hooks=dict(logger=dict(interval=100),
                           checkpoint=dict(interval=100)),
        device_prefetch=prefetch,
        work_dir=work_dir))


@pytest.mark.slow
def test_prefetch_matches_synchronous(tmp_path):
    root = str(tmp_path / 'data')
    _make_dataset(root)
    s0 = Runner(_cfg(root, str(tmp_path / 'wd0'), 0), seed=7).train()
    s2 = Runner(_cfg(root, str(tmp_path / 'wd2'), 2), seed=7).train()
    assert int(jax.device_get(s0.step)) == 6
    flat0 = jax.tree_util.tree_leaves(jax.device_get(s0.params))
    flat2 = jax.tree_util.tree_leaves(jax.device_get(s2.params))
    for a, b in zip(flat0, flat2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    bs0 = jax.tree_util.tree_leaves(jax.device_get(s0.batch_stats))
    bs2 = jax.tree_util.tree_leaves(jax.device_get(s2.batch_stats))
    for a, b in zip(bs0, bs2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
