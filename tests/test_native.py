"""Native augmentation core tests: builds the C++ lib, checks parity with the
numpy reference implementation and end-to-end fused behavior."""
import numpy as np
import pytest

from lednet_tpu import native


def test_native_builds():
    assert native.available(), 'g++ build of libledaug.so failed'


def test_resize_bilinear_matches_numpy_reference(rng):
    src = rng.integers(0, 255, (37, 53, 3), np.uint8)
    out_native = native.resize_bilinear_u8(src, 64, 96)
    out_py = native._py_resize(src, 64, 96, nearest=False)
    # same math, float rounding at the .5 boundary may differ by 1
    assert np.abs(out_native.astype(int) - out_py.astype(int)).max() <= 1


def test_resize_nearest_exact(rng):
    src = rng.integers(0, 255, (37, 53, 1), np.uint8)
    out_native = native.resize_nearest_u8(src, 64, 96)
    out_py = native._py_resize(src, 64, 96, nearest=True)
    np.testing.assert_array_equal(out_native, out_py)


def test_fused_resize_crop_flip_matches_composition(rng):
    src = rng.integers(0, 255, (48, 64, 3), np.uint8)
    rh, rw = 96, 128
    cy, cx, ch, cw = 10, 20, 32, 40
    fused = native.fused_resize_crop_flip(src, (rh, rw), (cy, cx), (ch, cw),
                                          flip=True)
    full = native.resize_bilinear_u8(src, rh, rw)
    ref = np.ascontiguousarray(full[cy:cy + ch, cx:cx + cw][:, ::-1])
    np.testing.assert_array_equal(fused, ref)


def test_batch_fused_augment(rng):
    srcs = [rng.integers(0, 255, (40 + i, 56, 3), np.uint8) for i in range(4)]
    params = np.array([[s.shape[0], s.shape[1], 80, 112, 5, 7, i % 2]
                       for i, s in enumerate(srcs)], np.int32)
    batch = native.batch_fused_augment(srcs, params, (32, 48))
    assert batch.shape == (4, 32, 48, 3)
    # element 0 must equal the single-sample call
    single = native.fused_resize_crop_flip(srcs[0], (80, 112), (5, 7),
                                           (32, 48), flip=False)
    np.testing.assert_array_equal(batch[0], single)


def test_fused_transform_pipeline(rng):
    from lednet_tpu.datasets.basesegdataset import Compose
    import lednet_tpu.datasets  # noqa: F401
    pipe = Compose([
        dict(type='FusedRandomResizeCropFlip', scale=(112, 48),
             crop_size=(32, 32), ratio_range=(0.8, 1.2), cat_max_ratio=0.75),
    ])
    np.random.seed(0)
    img = rng.integers(0, 255, (40, 56, 3), np.uint8)
    gt = rng.integers(0, 2, (40, 56)).astype(np.uint8)
    out = pipe(dict(img=img, gt_seg_map=gt, seg_fields=['gt_seg_map'],
                    label_map=None, reduce_zero_label=False))
    assert out['img'].shape == (32, 32, 3)
    assert out['gt_seg_map'].shape == (32, 32)
    assert set(np.unique(out['gt_seg_map'])) <= {0, 1}
