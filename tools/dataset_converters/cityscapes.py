#!/usr/bin/env python
"""Generate Cityscapes ``*_labelTrainIds.png`` from ``*_labelIds.png``.

Reference analogue: ``tools/dataset_converters/cityscapes.py``, which shells
out to cityscapesscripts; here the id->trainId mapping is applied directly
(same table), multi-threaded.
"""
import os.path as osp
import sys

sys.path.insert(0, osp.join(osp.dirname(osp.abspath(__file__)), '..', '..'))

import argparse
import glob
import os
from concurrent.futures import ThreadPoolExecutor

import numpy as np

# official cityscapes labelId -> trainId mapping (255 = ignore)
ID_TO_TRAINID = {
    7: 0, 8: 1, 11: 2, 12: 3, 13: 4, 17: 5, 19: 6, 20: 7, 21: 8, 22: 9,
    23: 10, 24: 11, 25: 12, 26: 13, 27: 14, 28: 15, 31: 16, 32: 17, 33: 18,
}


def build_lut():
    lut = np.full(256, 255, np.uint8)
    for k, v in ID_TO_TRAINID.items():
        lut[k] = v
    return lut


def convert_one(path, lut):
    import cv2
    seg = cv2.imread(path, cv2.IMREAD_UNCHANGED)
    out = lut[seg]
    out_path = path.replace('_labelIds.png', '_labelTrainIds.png')
    cv2.imwrite(out_path, out)
    return out_path


def main():
    p = argparse.ArgumentParser(description='cityscapes labelTrainIds')
    p.add_argument('cityscapes_path', help='root with gtFine/')
    p.add_argument('--gt-dir', default='gtFine')
    p.add_argument('--nproc', type=int, default=8)
    args = p.parse_args()

    gt_dir = osp.join(args.cityscapes_path, args.gt_dir)
    files = glob.glob(osp.join(gt_dir, '**', '*_labelIds.png'),
                      recursive=True)
    print(f'converting {len(files)} label maps')
    lut = build_lut()
    with ThreadPoolExecutor(max_workers=args.nproc) as pool:
        list(pool.map(lambda f: convert_one(f, lut), files))
    print('done')


if __name__ == '__main__':
    main()
