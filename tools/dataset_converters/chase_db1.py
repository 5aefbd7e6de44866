#!/usr/bin/env python
"""Prepare CHASE_DB1 retina-vessel data.

Reference analogue ``tools/dataset_converters/chase_db1.py``: unzip
CHASEDB1.zip (84 files = 28 images x [image, 1stHO, 2ndHO]), first 60
sorted entries -> training, rest -> validation; .jpg are images, the rest
are masks binarized with ``// 128``.
"""
import os.path as osp
import sys

sys.path.insert(0, osp.join(osp.dirname(osp.abspath(__file__)), '..', '..'))

import argparse
import os
import tempfile
import zipfile

from tools.dataset_converters._common import (make_split_dirs,
                                              write_binary_mask)

CHASE_DB1_LEN = 28 * 3
TRAINING_LEN = 60


def main():
    p = argparse.ArgumentParser(description='CHASE_DB1 preparation')
    p.add_argument('dataset_path', help='path of CHASEDB1.zip')
    p.add_argument('--tmp_dir', default=None)
    p.add_argument('-o', '--out_dir', default=osp.join('data', 'CHASE_DB1'))
    args = p.parse_args()

    import cv2
    make_split_dirs(args.out_dir)
    with tempfile.TemporaryDirectory(dir=args.tmp_dir) as tmp:
        print('extracting', args.dataset_path)
        zipfile.ZipFile(args.dataset_path).extractall(tmp)
        names = sorted(os.listdir(tmp))
        assert len(names) == CHASE_DB1_LEN, \
            f'expected {CHASE_DB1_LEN} files, got {len(names)}'
        for i, name in enumerate(names):
            split = 'training' if i < TRAINING_LEN else 'validation'
            stem = osp.splitext(name)[0]
            img = cv2.imread(osp.join(tmp, name))
            if name.endswith('.jpg'):
                cv2.imwrite(osp.join(args.out_dir, 'images', split,
                                     stem + '.png'), img)
            else:
                write_binary_mask(img, osp.join(args.out_dir, 'annotations',
                                                split, stem + '.png'))
    print('done')


if __name__ == '__main__':
    main()
