#!/usr/bin/env python
"""Prepare DRIVE retina-vessel data.

Reference analogue ``tools/dataset_converters/drive.py``: training.zip ->
training split, test.zip -> validation split; ``images/*.tif`` re-encoded
as PNG with ``_training``/``_test`` stripped from the stem; ``1st_manual``
(and the test set's ``2nd_manual``) .gif masks binarized with ``// 128``.
"""
import os.path as osp
import sys

sys.path.insert(0, osp.join(osp.dirname(osp.abspath(__file__)), '..', '..'))

import argparse
import os
import tempfile
import zipfile

from tools.dataset_converters._common import (make_split_dirs,
                                              read_gif_frame,
                                              write_binary_mask)


def _convert(tmp: str, subdir: str, out_dir: str, split: str, strip: str):
    import cv2
    img_dir = osp.join(tmp, subdir, 'images')
    for name in sorted(os.listdir(img_dir)):
        stem = osp.splitext(name)[0].replace(strip, '')
        cv2.imwrite(osp.join(out_dir, 'images', split, stem + '.png'),
                    cv2.imread(osp.join(img_dir, name)))
    for manual in ('1st_manual', '2nd_manual'):
        ann_dir = osp.join(tmp, subdir, manual)
        if not osp.isdir(ann_dir):
            continue
        for name in sorted(os.listdir(ann_dir)):
            stem = osp.splitext(name)[0]
            mask = read_gif_frame(osp.join(ann_dir, name))
            write_binary_mask(mask, osp.join(out_dir, 'annotations', split,
                                             stem + '.png'))


def main():
    p = argparse.ArgumentParser(description='DRIVE preparation')
    p.add_argument('training_path', help='path of training.zip')
    p.add_argument('testing_path', help='path of test.zip')
    p.add_argument('--tmp_dir', default=None)
    p.add_argument('-o', '--out_dir', default=osp.join('data', 'DRIVE'))
    args = p.parse_args()

    make_split_dirs(args.out_dir)
    with tempfile.TemporaryDirectory(dir=args.tmp_dir) as tmp:
        print('extracting', args.training_path)
        zipfile.ZipFile(args.training_path).extractall(tmp)
        _convert(tmp, 'training', args.out_dir, 'training', '_training')
        print('extracting', args.testing_path)
        zipfile.ZipFile(args.testing_path).extractall(tmp)
        _convert(tmp, 'test', args.out_dir, 'validation', '_test')
    print('done')


if __name__ == '__main__':
    main()
