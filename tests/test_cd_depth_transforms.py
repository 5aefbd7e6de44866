"""Semantic tests for the change-detection / depth / padding transforms and
the Concat/Repeat dataset wrappers (reference surface: ``Pad`` in
voc12_aug, ``RandomRotFlip`` in synapse, ``LoadMultipleRSImageFromFile`` +
``ConcatCDInput`` in levir_256x256, ``LoadDepthAnnotation`` +
``RandomDepthMix`` in nyu, mmengine Concat/RepeatDataset)."""
import os

import cv2
import numpy as np
import pytest

import lednet_tpu
from lednet_tpu.registry import DATASETS, TRANSFORMS

lednet_tpu.register_all_modules()


def _results(rng, h=20, w=30):
    img = rng.integers(0, 255, (h, w, 3), np.uint8)
    seg = rng.integers(0, 4, (h, w), np.uint8)
    return dict(img=img, gt_seg_map=seg, img_shape=(h, w), ori_shape=(h, w),
                seg_fields=['gt_seg_map'])


def test_pad_to_size(rng):
    res = _results(rng, 20, 30)
    out = TRANSFORMS.build(dict(type='Pad', size=(32, 32), pad_val=0,
                                seg_pad_val=255))(res)
    assert out['img'].shape == (32, 32, 3)
    assert out['gt_seg_map'].shape == (32, 32)
    assert (out['img'][20:] == 0).all() and (out['img'][:, 30:] == 0).all()
    assert (out['gt_seg_map'][20:] == 255).all()
    assert out['pad_shape'] == (32, 32)


def test_pad_size_divisor_and_noop(rng):
    out = TRANSFORMS.build(dict(type='Pad', size_divisor=16))(_results(
        rng, 20, 30))
    assert out['img'].shape[:2] == (32, 32)
    # already-large image is never shrunk by size padding
    out2 = TRANSFORMS.build(dict(type='Pad', size=(8, 8)))(_results(
        rng, 20, 30))
    assert out2['img'].shape[:2] == (20, 30)


def test_random_rotflip_branches(rng):
    # rotate_prob=1: plain rotation keeps shape, no flip
    res = _results(rng)
    src = res['img'].copy()
    out = TRANSFORMS.build(dict(type='RandomRotFlip', rotate_prob=1.0,
                                flip_prob=0.0, degree=20))(res)
    assert out['img'].shape == src.shape
    # rotate_prob=0, flip_prob=1: k*90 rot + axis flip -> every pixel value
    # multiset is preserved exactly
    res2 = _results(rng, 24, 24)
    vals = np.sort(res2['img'].sum(-1), axis=None).copy()
    out2 = TRANSFORMS.build(dict(type='RandomRotFlip', rotate_prob=0.0,
                                 flip_prob=1.0))(res2)
    np.testing.assert_array_equal(np.sort(out2['img'].sum(-1), axis=None),
                                  vals)
    # both zero: identity
    res3 = _results(rng)
    src3 = res3['img'].copy()
    out3 = TRANSFORMS.build(dict(type='RandomRotFlip', rotate_prob=0.0,
                                 flip_prob=0.0))(res3)
    np.testing.assert_array_equal(out3['img'], src3)


def test_concat_cd_input(rng):
    res = _results(rng)
    res['img2'] = rng.integers(0, 255, (20, 30, 3), np.uint8)
    a, b = res['img'].copy(), res['img2'].copy()
    out = TRANSFORMS.build(dict(type='ConcatCDInput'))(res)
    assert out['img'].shape == (20, 30, 6)
    assert 'img2' not in out
    np.testing.assert_array_equal(out['img'][..., :3], a)
    np.testing.assert_array_equal(out['img'][..., 3:], b)


def test_random_depth_mix(rng):
    res = _results(rng)
    res['gt_depth_map'] = rng.random((20, 30)).astype(np.float32) * 10
    res['depth_rescale_factor'] = 1e-3
    res['img'] = res['img'].astype(np.float32)
    out = TRANSFORMS.build(dict(type='RandomDepthMix', prob=1.0))(res)
    # some column strip now equals depth/factor in all channels
    diff = out['img'][..., 0] != out['img'][..., 1]
    assert out['img'].shape == (20, 30, 3)
    # prob=0 is identity
    res2 = _results(rng)
    src2 = res2['img'].copy()
    res2['gt_depth_map'] = res['gt_depth_map']
    out2 = TRANSFORMS.build(dict(type='RandomDepthMix', prob=0.0))(res2)
    np.testing.assert_array_equal(out2['img'], src2)


def test_load_depth_annotation(tmp_path, rng):
    depth = rng.integers(0, 5000, (12, 16)).astype(np.uint16)
    path = str(tmp_path / 'depth.png')
    cv2.imwrite(path, depth)
    res = dict(depth_map_path=path, seg_fields=[])
    out = TRANSFORMS.build(dict(type='LoadDepthAnnotation',
                                depth_rescale_factor=1e-3))(res)
    assert out['gt_depth_map'].dtype == np.float32
    np.testing.assert_allclose(out['gt_depth_map'],
                               depth.astype(np.float32) * 1e-3)
    assert 'gt_depth_map' in out['seg_fields']
    assert out['depth_rescale_factor'] == 1e-3


def test_load_multiple_rs_images(tmp_path, rng):
    a = rng.integers(0, 255, (10, 14, 3), np.uint8)
    b = rng.integers(0, 255, (10, 14, 3), np.uint8)
    pa, pb = str(tmp_path / 'a.png'), str(tmp_path / 'b.png')
    cv2.imwrite(pa, a)
    cv2.imwrite(pb, b)
    res = dict(img_path=pa, img_path2=pb)
    out = TRANSFORMS.build(dict(type='LoadMultipleRSImageFromFile'))(res)
    assert out['img'].dtype == np.float32
    assert out['img'].shape == out['img2'].shape == (10, 14, 3)
    assert out['ori_shape'] == (10, 14)


def _write_voc_tree(root, n, rng, stem_prefix='im'):
    os.makedirs(root / 'JPEGImages', exist_ok=True)
    os.makedirs(root / 'SegmentationClassPNG', exist_ok=True)
    stems = []
    for i in range(n):
        stem = f'{stem_prefix}{i}'
        # the fork's PascalVOCDataset scans .png imagery (SURVEY §2.6)
        cv2.imwrite(str(root / 'JPEGImages' / f'{stem}.png'),
                    rng.integers(0, 255, (8, 8, 3), np.uint8))
        cv2.imwrite(str(root / 'SegmentationClassPNG' / f'{stem}.png'),
                    rng.integers(0, 2, (8, 8), np.uint8))
        stems.append(stem)
    return stems


def test_concat_and_repeat_dataset(tmp_path, rng):
    _write_voc_tree(tmp_path, 3, rng)
    child = dict(type='PascalVOCDataset', data_root=str(tmp_path),
                 data_prefix=dict(img_path='JPEGImages',
                                  seg_map_path='SegmentationClassPNG'),
                 pipeline=[dict(type='LoadImageFromFile'),
                           dict(type='LoadAnnotations'),
                           dict(type='PackSegInputs')])
    cat = DATASETS.build(dict(type='ConcatDataset',
                              datasets=[dict(child), dict(child)]))
    assert len(cat) == 6
    assert cat.metainfo['classes'] == ('background', 'branch')
    # index 4 lands in the second child at local index 1
    assert (cat.get_data_info(4)['img_path']
            == cat.datasets[1].get_data_info(1)['img_path'])
    sample = cat[5]
    assert 'inputs' in sample

    rep = DATASETS.build(dict(type='RepeatDataset', dataset=dict(child),
                              times=5))
    assert len(rep) == 15
    assert (rep.get_data_info(7)['img_path']
            == rep.dataset.get_data_info(1)['img_path'])
    assert 'inputs' in rep[14]


def test_levir_pairs_and_nyu_depth_alias(tmp_path, rng):
    # LEVIR: A/B/label trees; items must carry img_path2
    for sub in ('A', 'B', 'label'):
        os.makedirs(tmp_path / 'train' / sub, exist_ok=True)
    for i in range(2):
        for sub in ('A', 'B'):
            cv2.imwrite(str(tmp_path / 'train' / sub / f'{i}.png'),
                        rng.integers(0, 255, (8, 8, 3), np.uint8))
        cv2.imwrite(str(tmp_path / 'train' / 'label' / f'{i}.png'),
                    rng.integers(0, 2, (8, 8), np.uint8))
    levir = DATASETS.build(dict(
        type='LEVIRCDDataset', data_root=str(tmp_path),
        data_prefix=dict(img_path='train/A', img_path2='train/B',
                         seg_map_path='train/label'),
        pipeline=[dict(type='LoadMultipleRSImageFromFile'),
                  dict(type='LoadAnnotations'),
                  dict(type='ConcatCDInput'),
                  dict(type='PackSegInputs')]))
    assert len(levir) == 2
    info = levir.get_data_info(0)
    assert 'train/B' in info['img_path2']
    sample = levir[0]
    assert sample['inputs'].shape[-1] == 6 or sample['inputs'].shape[0] == 6

    # NYU: depth_map_path prefix alias
    os.makedirs(tmp_path / 'images', exist_ok=True)
    os.makedirs(tmp_path / 'ann', exist_ok=True)
    cv2.imwrite(str(tmp_path / 'images' / 'x.jpg'),
                rng.integers(0, 255, (8, 8, 3), np.uint8))
    cv2.imwrite(str(tmp_path / 'ann' / 'x.png'),
                rng.integers(0, 5000, (8, 8)).astype(np.uint16))
    nyu = DATASETS.build(dict(
        type='NYUDataset', data_root=str(tmp_path),
        data_prefix=dict(img_path='images', depth_map_path='ann'),
        pipeline=[]))
    assert len(nyu) == 1
    assert nyu.get_data_info(0)['depth_map_path'].endswith('x.png')


def test_concat_dataset_negative_index(tmp_path, rng):
    _write_voc_tree(tmp_path, 3, rng)
    child = dict(type='PascalVOCDataset', data_root=str(tmp_path),
                 data_prefix=dict(img_path='JPEGImages',
                                  seg_map_path='SegmentationClassPNG'),
                 pipeline=[dict(type='LoadImageFromFile'),
                           dict(type='LoadAnnotations'),
                           dict(type='PackSegInputs')])
    cat = DATASETS.build(dict(type='ConcatDataset',
                              datasets=[dict(child), dict(child)]))
    # -1 must resolve into the SECOND child's last item, not the first's
    assert (cat.get_data_info(-1)['img_path']
            == cat.datasets[1].get_data_info(2)['img_path'])
    with pytest.raises(IndexError):
        cat.get_data_info(6)
    with pytest.raises(IndexError):
        cat.get_data_info(-7)


def test_albu_keymap_routes_every_target(rng):
    from lednet_tpu.registry import TRANSFORMS
    albu = TRANSFORMS.build(dict(
        type='Albu', transforms=[],
        keymap={'img': 'image', 'img2': 'image2', 'gt_seg_map': 'mask'},
        additional_targets={'image2': 'image'}))

    calls = {}

    def fake_compose(**kw):
        calls.update(kw)
        # flip everything, as a geometric aug would (same op on all targets)
        return {k: v[:, ::-1] for k, v in kw.items()}

    albu._compose = fake_compose  # albumentations absent in this image
    img = rng.integers(0, 255, (4, 6, 3), np.uint8)
    img2 = rng.integers(0, 255, (4, 6, 3), np.uint8)
    seg = rng.integers(0, 2, (4, 6), np.uint8)
    res = albu(dict(img=img.copy(), img2=img2.copy(), gt_seg_map=seg.copy()))
    # every keymap'd field was handed to albumentations and written back
    assert set(calls) == {'image', 'image2', 'mask'}
    np.testing.assert_array_equal(res['img'], img[:, ::-1])
    np.testing.assert_array_equal(res['img2'], img2[:, ::-1])
    np.testing.assert_array_equal(res['gt_seg_map'], seg[:, ::-1])
