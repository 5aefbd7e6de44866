#!/usr/bin/env python
"""Prepare COCO-Stuff 164k ``*_labelTrainIds.png`` annotations.

Reference analogue ``tools/dataset_converters/coco_stuff164k.py``: the
stuffthingmaps use 182 raw ids of which 11 thing classes were removed from
COCO ({11, 25, 28, 29, 44, 65, 67, 68, 70, 82, 90}); the mapping packs the
remaining 171 ids consecutively and keeps 255 as ignore. Images are copied
verbatim; masks are remapped with a LUT (vectorized, multiprocess) instead
of the reference's 172 per-id boolean scans.
"""
import os.path as osp
import sys

sys.path.insert(0, osp.join(osp.dirname(osp.abspath(__file__)), '..', '..'))

import argparse
import glob
import os
import shutil
from functools import partial
from multiprocessing import Pool

import numpy as np

COCO_LEN = 123287
_REMOVED = (11, 25, 28, 29, 44, 65, 67, 68, 70, 82, 90)


def build_lut() -> np.ndarray:
    lut = np.full(256, 255, np.uint8)
    train_id = 0
    for raw in range(182):
        if raw in _REMOVED:
            continue
        lut[raw] = train_id
        train_id += 1
    return lut


def convert_to_train_id(mask_path: str, out_mask_dir: str, split: str,
                        lut: np.ndarray):
    import cv2
    mask = cv2.imread(mask_path, cv2.IMREAD_GRAYSCALE)
    out = osp.join(out_mask_dir, split,
                   osp.basename(mask_path).split('.')[0] +
                   '_labelTrainIds.png')
    cv2.imwrite(out, lut[mask])


def main():
    p = argparse.ArgumentParser(description='COCO-Stuff 164k preparation')
    p.add_argument('coco_path', help='root with images/ + annotations/')
    p.add_argument('-o', '--out_dir', default=None)
    p.add_argument('--nproc', type=int, default=16)
    args = p.parse_args()
    out_dir = args.out_dir or args.coco_path

    out_img_dir = osp.join(out_dir, 'images')
    out_mask_dir = osp.join(out_dir, 'annotations')
    for split in ('train2017', 'val2017'):
        os.makedirs(osp.join(out_mask_dir, split), exist_ok=True)
    if out_dir != args.coco_path and not osp.exists(out_img_dir):
        shutil.copytree(osp.join(args.coco_path, 'images'), out_img_dir)

    lut = build_lut()
    for split in ('train2017', 'val2017'):
        masks = sorted(glob.glob(osp.join(args.coco_path, 'annotations',
                                          split, '*.png')))
        print(f'{split}: {len(masks)} masks')
        with Pool(args.nproc) as pool:
            pool.map(partial(convert_to_train_id, out_mask_dir=out_mask_dir,
                             split=split, lut=lut), masks)
    print('done')


if __name__ == '__main__':
    main()
