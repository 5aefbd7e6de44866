#!/usr/bin/env python
"""Prepare COCO-Stuff 10k from the .mat release.

Reference analogue ``tools/dataset_converters/coco_stuff10k.py``: labels
live in ``annotations/*.mat`` under key ``'S'`` with 1-based ids (0 =
unlabeled); 11 removed thing ids ({12, 26, 29, 30, 45, 66, 68, 69, 71, 83,
91} in this 1-based scheme) are skipped and the rest packed consecutively
starting at 0 (so raw 0 -> 0, handled downstream by reduce_zero_label).
Splits come from ``imageLists/{train,test}.txt``; images are copied to
``images/{train2017,test2017}`` and masks written as
``*_labelTrainIds.png``.
"""
import os.path as osp
import sys

sys.path.insert(0, osp.join(osp.dirname(osp.abspath(__file__)), '..', '..'))

import argparse
import os
import shutil

import numpy as np

_REMOVED = (12, 26, 29, 30, 45, 66, 68, 69, 71, 83, 91)


def build_lut() -> np.ndarray:
    lut = np.full(256, 255, np.uint8)
    train_id = 0
    for raw in range(183):
        if raw in _REMOVED:
            continue
        lut[raw] = train_id
        train_id += 1
    return lut


def main():
    p = argparse.ArgumentParser(description='COCO-Stuff 10k preparation')
    p.add_argument('coco_path',
                   help='root with images/, annotations/ (.mat), imageLists/')
    p.add_argument('-o', '--out_dir', default=None)
    args = p.parse_args()
    out_dir = args.out_dir or args.coco_path

    from scipy.io import loadmat
    import cv2
    lut = build_lut()
    for list_name, split in (('train.txt', 'train2017'),
                             ('test.txt', 'test2017')):
        with open(osp.join(args.coco_path, 'imageLists', list_name)) as f:
            names = [line.strip() for line in f if line.strip()]
        os.makedirs(osp.join(out_dir, 'images', split), exist_ok=True)
        os.makedirs(osp.join(out_dir, 'annotations', split), exist_ok=True)
        print(f'{split}: {len(names)} samples')
        for name in names:
            src_img = osp.join(args.coco_path, 'images', name + '.jpg')
            if osp.exists(src_img):
                shutil.copy(src_img, osp.join(out_dir, 'images', split,
                                              name + '.jpg'))
            mat = loadmat(osp.join(args.coco_path, 'annotations',
                                   name + '.mat'))
            mask = lut[np.asarray(mat['S'], np.uint16).clip(0, 255)]
            cv2.imwrite(osp.join(out_dir, 'annotations', split,
                                 name + '_labelTrainIds.png'), mask)
    print('done')


if __name__ == '__main__':
    main()
