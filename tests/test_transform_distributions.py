"""Distributional contracts for the augmentation pipeline (SURVEY §7.4.3).

mmcv/torchvision are not installed here, so instead of histogram diffs
against them these tests pin the *sampling distributions and exact size
math* the reference pipeline relies on (``mmseg/datasets/transforms/
transforms.py`` + mmcv's ``rescale_size``): uniform resize ratios, flip
coin fairness, the cat_max_ratio redraw loop actually biasing crops, and
photometric jitter staying inside its configured ranges.
"""
import numpy as np
import pytest

from lednet_tpu.datasets.transforms.transforms import (
    PhotoMetricDistortion, RandomCrop, RandomFlip, RandomResize,
    RandomRotate, _rescale_size)


@pytest.fixture(autouse=True)
def _seed():
    np.random.seed(20260816)


def test_rescale_size_matches_mmcv_values():
    # hand-computed against mmcv.image.rescale_size semantics:
    # factor = min(max(scale)/long_edge, min(scale)/short_edge)
    assert _rescale_size((1280, 720), (2048, 512)) == (910, 512)
    assert _rescale_size((2048, 1024), (2048, 1024)) == (2048, 1024)
    assert _rescale_size((500, 300), (400, 200)) == (333, 200)
    assert _rescale_size((300, 500), (400, 200)) == (200, 333)
    assert _rescale_size((100, 100), 0.5) == (50, 50)
    _, f = _rescale_size((1280, 720), (2048, 512), return_scale=True)
    assert f == pytest.approx(512 / 720)


def test_random_resize_ratio_is_uniform():
    tr = RandomResize(scale=(200, 100), ratio_range=(0.5, 2.0),
                      keep_ratio=True)
    ratios = []
    for _ in range(3000):
        res = tr({'img': np.zeros((100, 200, 3), np.uint8), 'seg_fields': []})
        ratios.append(res['img'].shape[1] / 200.0)
    r = np.asarray(ratios)
    assert r.min() >= 0.5 - 0.01 and r.max() <= 2.0 + 0.01
    # uniform(0.5, 2) -> mean 1.25, se = 1.5/sqrt(12*N) ~ 0.008
    assert abs(r.mean() - 1.25) < 0.03
    hist, _ = np.histogram(r, bins=6, range=(0.5, 2.0))
    assert (np.abs(hist - 500) < 125).all(), hist  # each bin within 25%


def test_random_flip_coin_is_fair():
    tr = RandomFlip(prob=0.5)
    img = np.arange(12, dtype=np.uint8).reshape(2, 6, 1)
    flips = sum(tr({'img': img, 'seg_fields': []})['flip']
                for _ in range(2000))
    assert abs(flips / 2000 - 0.5) < 0.04
    # prob=None must never flip
    tr0 = RandomFlip(prob=None)
    assert not any(tr0({'img': img, 'seg_fields': []})['flip']
                   for _ in range(50))


def test_random_crop_cat_max_ratio_biases_sampling():
    # 200x200 map: 90% class 0, a 60-col stripe of class 1. A uniform
    # 100x100 crop satisfies max/sum < 0.75 only when it overlaps the
    # stripe substantially; the redraw loop must make that the norm.
    gt = np.zeros((200, 200), np.uint8)
    gt[:, 120:180] = 1
    img = np.zeros((200, 200, 3), np.uint8)
    tr = RandomCrop((100, 100), cat_max_ratio=0.75)
    ok = 0
    n = 300
    for _ in range(n):
        res = tr({'img': img.copy(), 'gt_seg_map': gt,
                  'seg_fields': ['gt_seg_map']})
        crop = res['gt_seg_map']
        assert crop.shape == (100, 100)
        _, cnt = np.unique(crop, return_counts=True)
        if cnt.max() / cnt.sum() < 0.75:
            ok += 1
    # best-effort loop (10 redraws): overwhelming majority must satisfy,
    # far above the ~39% a uniform sampler achieves on this layout
    assert ok / n > 0.95, ok


def test_random_crop_ignores_255():
    gt = np.full((120, 120), 255, np.uint8)
    gt[:, :10] = 3  # only one real class -> loop can never satisfy; must
    img = np.zeros((120, 120, 3), np.uint8)  # still terminate and crop
    tr = RandomCrop((100, 100), cat_max_ratio=0.75)
    res = tr({'img': img, 'gt_seg_map': gt, 'seg_fields': ['gt_seg_map']})
    assert res['gt_seg_map'].shape == (100, 100)


def test_photometric_brightness_range_and_rate():
    # gray image makes saturation/hue no-ops; contrast pinned to 1 ->
    # only the brightness branch can change pixels
    tr = PhotoMetricDistortion(brightness_delta=32, contrast_range=(1, 1),
                               saturation_range=(1, 1), hue_delta=1)
    base = np.full((8, 8, 3), 128, np.uint8)
    deltas = []
    for _ in range(2000):
        out = tr({'img': base.copy()})['img']
        d = out.astype(int) - 128
        assert d.min() == d.max()  # uniform shift across the image
        deltas.append(d.ravel()[0])
    deltas = np.asarray(deltas)
    assert np.abs(deltas).max() <= 32
    changed = np.mean(deltas != 0)
    # brightness coin is 50%; uniform(-32,32) hits 0 rarely
    assert 0.42 < changed < 0.58, changed
    nz = deltas[deltas != 0]
    assert abs(nz.mean()) < 2.5  # symmetric around 0

def test_photometric_contrast_range():
    tr = PhotoMetricDistortion(brightness_delta=0, contrast_range=(0.5, 1.5),
                               saturation_range=(1, 1), hue_delta=1)
    base = np.full((8, 8, 3), 100, np.uint8)
    alphas = []
    for _ in range(2000):
        out = tr({'img': base.copy()})['img']
        alphas.append(out.ravel()[0] / 100.0)
    a = np.asarray(alphas)
    assert a.min() >= 0.49 and a.max() <= 1.51
    changed = np.mean(np.abs(a - 1.0) > 0.02)
    assert 0.40 < changed < 0.58, changed


def test_random_rotate_prob_and_identity():
    img = np.random.randint(0, 255, (32, 32, 3), np.uint8)
    # prob=0 -> untouched
    tr0 = RandomRotate(prob=0.0, degree=30)
    out = tr0({'img': img.copy(), 'seg_fields': []})['img']
    np.testing.assert_array_equal(out, img)
    # degree=0 with prob=1 -> identity warp
    tr1 = RandomRotate(prob=1.0, degree=1e-9)
    out = tr1({'img': img.copy(), 'seg_fields': []})['img']
    np.testing.assert_array_equal(out, img)
    # seg fields stay nearest/label-valued under real rotation
    gt = np.random.randint(0, 5, (32, 32), np.uint8)
    tr = RandomRotate(prob=1.0, degree=(10, 20), seg_pad_val=255)
    res = tr({'img': img.copy(), 'gt_seg_map': gt.copy(),
              'seg_fields': ['gt_seg_map']})
    assert set(np.unique(res['gt_seg_map'])) <= set(range(5)) | {255}
