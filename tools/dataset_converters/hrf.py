#!/usr/bin/env python
"""Prepare HRF retina-vessel data.

Reference analogue ``tools/dataset_converters/hrf.py``: three image zips
(healthy / glaucoma / diabetic_retinopathy) + three matching
``*_manualsegm`` mask zips, 15 files each; the first 5 sorted entries of
every zip go to training, the rest to validation; masks binarized ``// 128``.
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

HRF_LEN = 15
TRAINING_LEN = 5


def _convert(zip_path: str, out_dir: str, kind: str, tmp_root):
    import cv2
    with tempfile.TemporaryDirectory(dir=tmp_root) as tmp:
        zipfile.ZipFile(zip_path).extractall(tmp)
        names = sorted(os.listdir(tmp))
        assert len(names) == HRF_LEN, \
            f'{zip_path}: expected {HRF_LEN} files, got {len(names)}'
        for i, name in enumerate(names):
            split = 'training' if i < TRAINING_LEN else 'validation'
            stem = osp.splitext(name)[0]
            img = cv2.imread(osp.join(tmp, name))
            dst = osp.join(out_dir, kind, split, stem + '.png')
            if kind == 'images':
                cv2.imwrite(dst, img)
            else:
                write_binary_mask(img, dst)


def main():
    p = argparse.ArgumentParser(description='HRF preparation')
    p.add_argument('healthy_path')
    p.add_argument('healthy_manualsegm_path')
    p.add_argument('glaucoma_path')
    p.add_argument('glaucoma_manualsegm_path')
    p.add_argument('diabetic_retinopathy_path')
    p.add_argument('diabetic_retinopathy_manualsegm_path')
    p.add_argument('--tmp_dir', default=None)
    p.add_argument('-o', '--out_dir', default=osp.join('data', 'HRF'))
    args = p.parse_args()

    make_split_dirs(args.out_dir)
    for path in (args.healthy_path, args.glaucoma_path,
                 args.diabetic_retinopathy_path):
        print('images:', path)
        _convert(path, args.out_dir, 'images', args.tmp_dir)
    for path in (args.healthy_manualsegm_path, args.glaucoma_manualsegm_path,
                 args.diabetic_retinopathy_manualsegm_path):
        print('annotations:', path)
        _convert(path, args.out_dir, 'annotations', args.tmp_dir)
    print('done')


if __name__ == '__main__':
    main()
