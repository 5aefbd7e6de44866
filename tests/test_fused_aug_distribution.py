"""FusedRandomResizeCropFlip distributional contracts (PLAN #5 gate):
the native fused transform must sample the same geometry distributions as
the python RandomResize -> RandomCrop -> RandomFlip chain, and its bilinear
resampling must agree with cv2.INTER_LINEAR to rounding."""
import numpy as np
import pytest

from lednet_tpu import native
from lednet_tpu.datasets.transforms.fused import FusedRandomResizeCropFlip


@pytest.fixture(autouse=True)
def _seed():
    np.random.seed(20260816)


def test_native_bilinear_matches_cv2():
    import cv2
    rng = np.random.default_rng(0)
    for (h, w, oh, ow) in [(37, 53, 64, 96), (100, 200, 50, 75),
                           (64, 64, 128, 128)]:
        src = rng.integers(0, 255, (h, w, 3)).astype(np.uint8)
        got = native.resize_bilinear_u8(src, oh, ow)
        ref = cv2.resize(src, (ow, oh), interpolation=cv2.INTER_LINEAR)
        diff = np.abs(got.astype(int) - ref.astype(int))
        assert diff.max() <= 2, (h, w, oh, ow, diff.max())
        assert (diff > 1).mean() < 0.01


def test_fused_geometry_distribution():
    tr = FusedRandomResizeCropFlip(scale=(200, 100), crop_size=(64, 64),
                                   ratio_range=(0.5, 2.0), flip_prob=0.5)
    img = np.zeros((100, 200, 3), np.uint8)
    ratios, flips = [], 0
    for _ in range(2000):
        res = tr({'img': img.copy(), 'seg_fields': []})
        assert res['img'].shape[:2] == (64, 64) or \
            res['img'].shape[0] <= 64  # ratio < crop -> clamped crop
        ratios.append(res['scale_factor'][0])
        flips += res['flip']
    r = np.asarray(ratios)
    # same contract as RandomResize: ~uniform(0.5, 2.0)
    assert 0.49 <= r.min() and r.max() <= 2.01
    assert abs(r.mean() - 1.25) < 0.04
    hist, _ = np.histogram(r, bins=6, range=(0.5, 2.0))
    assert (np.abs(hist - 2000 / 6) < 2000 / 6 * 0.3).all(), hist
    assert abs(flips / 2000 - 0.5) < 0.04


def test_fused_cat_max_ratio_bias():
    gt = np.zeros((200, 200), np.uint8)
    gt[:, 120:180] = 1
    img = np.zeros((200, 200, 3), np.uint8)
    tr = FusedRandomResizeCropFlip(scale=(200, 200), crop_size=(100, 100),
                                   ratio_range=(1.0, 1.0),  # pin resize
                                   cat_max_ratio=0.75, flip_prob=0.0)
    ok = 0
    n = 300
    for _ in range(n):
        res = tr({'img': img.copy(), 'gt_seg_map': gt.copy(),
                  'seg_fields': ['gt_seg_map']})
        _, cnt = np.unique(res['gt_seg_map'], return_counts=True)
        if cnt.max() / cnt.sum() < 0.75:
            ok += 1
    assert ok / n > 0.95, ok


def test_fused_label_values_survive():
    gt = np.random.default_rng(1).integers(0, 5, (80, 80)).astype(np.uint8)
    gt[0, :] = 255
    img = np.zeros((80, 80, 3), np.uint8)
    tr = FusedRandomResizeCropFlip(scale=(160, 160), crop_size=(64, 64))
    res = tr({'img': img, 'gt_seg_map': gt, 'seg_fields': ['gt_seg_map']})
    assert set(np.unique(res['gt_seg_map'])) <= set(range(5)) | {255}
