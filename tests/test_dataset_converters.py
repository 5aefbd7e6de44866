"""Dataset-converter CLIs: drive each end-to-end on fabricated archives and
check the produced trees/values (split sizes, // 128 binarization, LUTs,
tiling coverage)."""
import os
import os.path as osp
import subprocess
import sys
import zipfile

import numpy as np
import pytest

ROOT = osp.join(osp.dirname(__file__), '..')
CONV = osp.join(ROOT, 'tools', 'dataset_converters')


def run(script, *args):
    return subprocess.run([sys.executable, osp.join(CONV, script), *args],
                          capture_output=True, text=True, timeout=300)


def test_chase_db1_split_and_binarize(tmp_path):
    import cv2
    src = tmp_path / 'src'
    src.mkdir()
    rng = np.random.default_rng(0)
    for i in range(28):
        img = rng.integers(0, 255, (16, 16, 3)).astype(np.uint8)
        cv2.imwrite(str(src / f'Image_{i:02d}.jpg'), img)
        # nonstandard mask values (not exactly 0/255) exercise // 128
        mask = np.where(rng.random((16, 16)) > 0.5, 200, 20).astype(np.uint8)
        cv2.imwrite(str(src / f'Image_{i:02d}_1stHO.png'), mask)
        cv2.imwrite(str(src / f'Image_{i:02d}_2ndHO.png'), mask)
    zip_path = tmp_path / 'CHASEDB1.zip'
    with zipfile.ZipFile(zip_path, 'w') as z:
        for f in sorted(src.iterdir()):
            z.write(f, f.name)
    out = tmp_path / 'out'
    r = run('chase_db1.py', str(zip_path), '-o', str(out))
    assert r.returncode == 0, r.stderr
    n_train = len(os.listdir(out / 'images' / 'training')) + \
        len(os.listdir(out / 'annotations' / 'training'))
    n_val = len(os.listdir(out / 'images' / 'validation')) + \
        len(os.listdir(out / 'annotations' / 'validation'))
    assert n_train == 60 and n_val == 24
    any_mask = next((out / 'annotations' / 'training').iterdir())
    vals = set(np.unique(cv2.imread(str(any_mask), 0)))
    assert vals <= {0, 1}


def test_coco_stuff_luts():
    sys.path.insert(0, ROOT)
    from tools.dataset_converters.coco_stuff164k import build_lut as lut164
    from tools.dataset_converters.coco_stuff10k import build_lut as lut10
    l164 = lut164()
    # 171 classes, removed ids -> 255, consecutive otherwise
    assert l164[0] == 0 and l164[10] == 10 and l164[11] == 255
    assert l164[12] == 11 and l164[181] == 170 and l164[255] == 255
    assert sorted(v for v in l164[:182] if v != 255) == list(range(171))
    l10 = lut10()
    assert l10[0] == 0 and l10[12] == 255 and l10[13] == 12
    assert l10[182] == 171
    assert sorted(v for v in l10[:183] if v != 255) == list(range(172))


def test_isaid_tiling_and_colors(tmp_path):
    import cv2
    sys.path.insert(0, ROOT)
    from tools.dataset_converters.isaid import (ISAID_PALETTE,
                                                color_to_label, tile)
    # color round-trip
    ids = np.arange(16, dtype=np.uint8).reshape(4, 4)
    rgb = ISAID_PALETTE[ids]
    np.testing.assert_array_equal(color_to_label(rgb), ids)
    # tiling covers every pixel, including the shifted edge tiles
    arr = np.arange(30 * 50).reshape(30, 50)
    cover = np.zeros_like(arr)
    for y, x, t in tile(arr, 16, 4, pad_val=0):
        assert t.shape == (16, 16)
        cover[y:y + 16, x:x + 16] += 1
    assert (cover > 0).all()
    # end-to-end CLI
    d = tmp_path / 'raw' / 'train' / 'images'
    d.mkdir(parents=True)
    img = np.zeros((20, 20, 3), np.uint8)
    cv2.imwrite(str(d / 'P0000.png'), img)
    lab = ISAID_PALETTE[np.ones((20, 20), np.uint8)][..., ::-1]
    cv2.imwrite(str(d / 'P0000_instance_color_RGB.png'), lab)
    out = tmp_path / 'out'
    r = run('isaid.py', str(tmp_path / 'raw'), '-o', str(out),
            '--patch_width', '16', '--patch_height', '16',
            '--overlap_area', '4')
    assert r.returncode == 0, r.stderr
    anns = sorted(os.listdir(out / 'ann_dir' / 'train'))
    assert anns and all(a.endswith('_instance_color_RGB.png') for a in anns)
    a = cv2.imread(str(out / 'ann_dir' / 'train' / anns[0]), 0)
    assert set(np.unique(a)) <= {1, 255}  # class 1 + pad


def test_levircd_tiling(tmp_path):
    import cv2
    raw = tmp_path / 'raw' / 'train'
    for sub in ('A', 'B', 'label'):
        (raw / sub).mkdir(parents=True)
    img = np.random.default_rng(0).integers(0, 255, (40, 40, 3)).astype(np.uint8)
    lab = np.where(np.random.default_rng(1).random((40, 40)) > 0.5, 255, 0
                   ).astype(np.uint8)
    cv2.imwrite(str(raw / 'A' / 's.png'), img)
    cv2.imwrite(str(raw / 'B' / 's.png'), img)
    cv2.imwrite(str(raw / 'label' / 's.png'), lab)
    out = tmp_path / 'out'
    r = run('levircd.py', str(tmp_path / 'raw'), '-o', str(out),
            '--clip_size', '16', '--stride_size', '16')
    assert r.returncode == 0, r.stderr
    for sub in ('A', 'B', 'label'):
        files = os.listdir(out / 'train' / sub)
        assert len(files) == 9, (sub, files)  # ceil(40/16)^2 with edge shift
    t = cv2.imread(str(out / 'train' / 'label' / os.listdir(
        out / 'train' / 'label')[0]), 0)
    assert set(np.unique(t)) <= {0, 1}


def test_refuge_mask_remap(tmp_path):
    import cv2
    src = tmp_path / 'raw'
    inner = src / 'Annotation-Training400' / 'Disc_Cup_Masks'
    inner.mkdir(parents=True)
    mask = np.full((10, 10), 255, np.uint8)
    mask[2:5] = 128   # disc
    mask[3:4] = 0     # cup
    cv2.imwrite(str(inner / 'g0001.bmp'), np.stack([mask] * 3, -1))
    zip_path = src / 'REFUGE-Training-GT.zip'
    with zipfile.ZipFile(zip_path, 'w') as z:
        z.write(inner / 'g0001.bmp', 'Disc_Cup_Masks/g0001.bmp')
    out = tmp_path / 'out'
    r = run('refuge.py', '--raw_data_root', str(src), '-o', str(out))
    assert r.returncode == 0, r.stderr
    # 'training' split, 'annotations' kind (zip name contains 'train'+'gt')
    got = cv2.imread(str(out / 'annotations' / 'training' / 'g0001.png'), 0)
    assert got[0, 0] == 0 and got[2, 0] == 2 and got[3, 0] == 1


def test_synapse_label_remap():
    sys.path.insert(0, ROOT)
    from tools.dataset_converters.synapse import remap_label
    raw = np.arange(14, dtype=np.uint8)
    out = remap_label(raw)
    expect = np.zeros(14, np.uint8)
    for r, n in {8: 1, 4: 2, 3: 3, 2: 4, 6: 5, 11: 6, 1: 7, 7: 8}.items():
        expect[r] = n
    np.testing.assert_array_equal(out, expect)


def test_pascal_context_gates_cleanly(tmp_path):
    r = run('pascal_context.py', str(tmp_path), str(tmp_path / 'x.json'))
    assert r.returncode != 0
    assert 'detail' in (r.stdout + r.stderr).lower()


def test_wider_dataset_registry_round2(tmp_path):
    """New wave: PascalContext59 / Mapillary v2 / HSIDrive20 / Decathlon /
    DSDL (gated) — reference mmseg/datasets/*.py parity."""
    import json

    from lednet_tpu.registry import DATASETS
    import lednet_tpu
    lednet_tpu.register_all_modules()
    for n in ('PascalContextDataset59', 'MapillaryDataset_v2',
              'HSIDrive20Dataset', 'DSDLSegDataset'):
        assert n in DATASETS

    # Decathlon: dataset.json drives the file list and metainfo
    dj = dict(name='BRATS', modality={'0': 'FLAIR'},
              labels={'0': 'background', '1': 'edema'},
              training=[dict(image='./imagesTr/a.nii.gz',
                             label='./labelsTr/a.nii.gz')],
              test=['./imagesTs/b.nii.gz'])
    ann = tmp_path / 'dataset.json'
    ann.write_text(json.dumps(dj))
    # ann_file is data_root-relative (the standard dataset convention)
    ds = DATASETS.build(dict(type='DecathlonDataset', data_root=str(tmp_path),
                             ann_file='dataset.json', lazy_init=False,
                             serialize_data=False))
    infos = ds.load_data_list()
    assert len(infos) == 1
    assert infos[0]['img_path'].endswith('imagesTr/a.nii.gz')
    assert infos[0]['seg_map_path'].endswith('labelsTr/a.nii.gz')
    assert ds.metainfo.get('classes') == ['background', 'edema']

    # DSDL stays gated exactly like the reference
    import pytest
    with pytest.raises((RuntimeError, NotImplementedError)):
        DATASETS.build(dict(type='DSDLSegDataset'))
