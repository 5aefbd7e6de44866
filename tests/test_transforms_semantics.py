"""Per-transform semantic tests (reference strategy: shape/label/value
assertions per transform, ``tests/test_datasets/test_transform.py``) for
the transforms not covered by the distributional suite: CLAHE, AdjustGamma,
Rerange, RGB2Gray, SegRescale, GenerateEdge, ResizeShortestEdge,
ResizeToMultiple, RandomMosaic."""
import numpy as np

from lednet_tpu.registry import TRANSFORMS
import lednet_tpu.datasets  # noqa: F401


def _results(rng, h=32, w=48):
    img = rng.integers(0, 255, (h, w, 3), np.uint8)
    seg = rng.integers(0, 4, (h, w), np.uint8)
    return dict(img=img, gt_seg_map=seg, img_shape=(h, w), ori_shape=(h, w),
                seg_fields=['gt_seg_map'])


def test_adjust_gamma_lut(rng):
    res = _results(rng)
    src = res['img'].copy()
    out = TRANSFORMS.build(dict(type='AdjustGamma', gamma=0.5))(res)
    # gamma < 1 darkens via the (i/255)^(1/gamma) table
    table = ((np.arange(256) / 255.0) ** 2.0 * 255).astype(np.uint8)
    np.testing.assert_array_equal(out['img'], table[src])
    # gamma=1.0 is identity
    res2 = dict(_results(rng), img=src.copy())
    out2 = TRANSFORMS.build(dict(type='AdjustGamma', gamma=1.0))(res2)
    np.testing.assert_array_equal(out2['img'], src)


def test_rerange_bounds(rng):
    res = _results(rng)
    out = TRANSFORMS.build(dict(type='Rerange', min_value=10,
                                max_value=20))(res)
    assert np.isclose(out['img'].min(), 10) and np.isclose(out['img'].max(),
                                                           20)


def test_rgb2gray_weights_and_channels(rng):
    res = _results(rng)
    src = res['img'].astype(np.float32)
    out = TRANSFORMS.build(dict(type='RGB2Gray'))(res)
    assert out['img'].shape == src.shape  # tiled back to 3 channels
    want = (src * np.array([0.299, 0.587, 0.114])).sum(2)
    np.testing.assert_allclose(out['img'][..., 0], want, atol=1e-4)
    np.testing.assert_allclose(out['img'][..., 1], out['img'][..., 0])
    res2 = dict(_results(rng))
    out2 = TRANSFORMS.build(dict(type='RGB2Gray', out_channels=1))(res2)
    assert out2['img'].shape[2] == 1


def test_clahe_runs_and_keeps_shape(rng):
    res = _results(rng)
    shape = res['img'].shape
    out = TRANSFORMS.build(dict(type='CLAHE'))(res)
    assert out['img'].shape == shape
    assert out['img'].dtype == np.uint8


def test_seg_rescale_only_touches_seg(rng):
    res = _results(rng, 32, 48)
    img_before = res['img'].copy()
    out = TRANSFORMS.build(dict(type='SegRescale', scale_factor=0.5))(res)
    assert out['gt_seg_map'].shape == (16, 24)
    np.testing.assert_array_equal(out['img'], img_before)
    # nearest: no new label values invented
    assert set(np.unique(out['gt_seg_map'])) <= {0, 1, 2, 3}


def test_generate_edge_boundaries(rng):
    res = _results(rng)
    seg = np.zeros((32, 48), np.uint8)
    seg[:, 24:] = 1
    res['gt_seg_map'] = seg
    out = TRANSFORMS.build(dict(type='GenerateEdge', edge_width=1))(res)
    edge = out['gt_edge_map']
    assert 'gt_edge_map' in out['seg_fields']
    assert set(np.unique(edge)) == {0, 1}
    # the vertical boundary columns are edges, far-away columns are not
    assert edge[:, 23].all() and edge[:, 24].all()
    assert not edge[:, 5].any() and not edge[:, 40].any()
    # ignore_index pixels produce no edges
    seg2 = np.zeros((32, 48), np.uint8)
    seg2[:, 24:] = 255
    res2 = dict(_results(rng), gt_seg_map=seg2)
    out2 = TRANSFORMS.build(dict(type='GenerateEdge', edge_width=1))(res2)
    assert not out2['gt_edge_map'][:, 24:].any()


def test_generate_edge_dilation(rng):
    res = _results(rng)
    seg = np.zeros((32, 48), np.uint8)
    seg[:, 24:] = 1
    res['gt_seg_map'] = seg
    out = TRANSFORMS.build(dict(type='GenerateEdge', edge_width=3))(res)
    assert out['gt_edge_map'][:, 22:26].all()  # 2-col edge dilated +-1


def test_resize_shortest_edge_caps_long_side(rng):
    res = _results(rng, 30, 90)
    out = TRANSFORMS.build(dict(type='ResizeShortestEdge', scale=60,
                                max_size=120))(res)
    h, w = out['img'].shape[:2]
    # short edge would go 30->60 (f=2) but the long edge 90*2=180 > 120
    # caps f at 120/90
    assert w == 120 and h == 40
    assert out['gt_seg_map'].shape == (h, w)


def test_resize_to_multiple(rng):
    res = _results(rng, 30, 45)
    out = TRANSFORMS.build(dict(type='ResizeToMultiple',
                                size_divisor=32))(res)
    h, w = out['img'].shape[:2]
    assert h % 32 == 0 and w % 32 == 0


def test_random_mosaic_prob_zero_is_identity(rng):
    res = _results(rng)
    img = res['img'].copy()
    out = TRANSFORMS.build(dict(type='RandomMosaic', prob=0.0))(res)
    np.testing.assert_array_equal(out['img'], img)


def test_random_mosaic_without_dataset_is_identity(rng):
    # prob=1 but no results['dataset'] (not wrapped): no-op by contract
    res = _results(rng)
    img = res['img'].copy()
    out = TRANSFORMS.build(dict(type='RandomMosaic', prob=1.0))(res)
    np.testing.assert_array_equal(out['img'], img)
